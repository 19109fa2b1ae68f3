"""Query library exposed through __spark_entry__.py.

Importing the submodules populates the registry (one entry per operator
family from SURVEY.md section 2, plus the large-scale training-data
extensions).
"""

from .registry import ORACLE, QUERIES, load_table, register  # noqa: F401
from . import core  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
from . import round3  # noqa: F401,E402
from . import round3b  # noqa: F401,E402
from . import round4  # noqa: F401,E402
from . import round5  # noqa: F401,E402
from . import round6  # noqa: F401,E402
from . import round6b  # noqa: F401,E402
from . import round6c  # noqa: F401,E402
from . import round6d  # noqa: F401,E402
from . import round7  # noqa: F401,E402
from . import round8  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50; the one red fixed + re-proven green r4), r4 the never-green
# re-proofs + TPC-H + breadth/sketch/graph/round-3b block (50/50 green),
# r5 the final 50 never-checked entries (50/50 green -> cumulative 200/200
# over the round-4 registry).
# Round 9 window (VERDICT r8 "Next round" #1 — re-verdict the late-r8
# verify_jaccard/loop_frame refactor's consumers and the r04 vintage;
# after this window no entry's latest verdict predates r05 or its
# current code):
# 1. Every consumer of the verify-prune path whose CODE changed again
#    THIS round (the r8-advice broadcast-hint removal in
#    operators/dedup.py verify_jaccard): the LSH/minhash family block,
#    documents-scan adjacent so the shared shingle/wide/pairs caches
#    stay hot across the window (dedup_minhash_lsh anchors them).
# 2. The graph/contract/winnow/pretrain leads the r8 verdict names —
#    their latest verdicts (r04) predate both the r8 refactor and this
#    round's changes; minhash_estimate_contract additionally gains the
#    sampled accuracy contract this round (VERDICT #3) and
#    decontaminate_bloom_prefilter the 3rd-decade flattening (#4).
# 3. rolling_7d_user_value — yielded its r8 slot, re-confirms here;
#    dau_wau_engagement — its WAU redesigned THIS round (interval
#    stabbing replaces the explode-x7 distinct; plans/core.py), so the
#    r05 verdict predates the new code and it re-proves here (it took
#    the slot of incremental_ingest_dedup, which stays r05-vintage and
#    unchanged).
# 4. r05-vintage dedup-family stragglers adjacent to the block
#    (dedup_simhash, dedup_source_syndication).
# 5. Fill to 50 with the remaining r04 vintage: the TPC-H block +
#    function-breadth + sketch entries.
# Ordering: changed-code entries first (freshest evidence for the
# newest code), documents-scan entries adjacent, RUN_AFTER anchors
# (graph_triangle_counts -> minhash_estimate_contract) kept adjacent.
# Pinned by tests/test_registry_contract so a new registration cannot
# silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_clusters",
    "neardup_cluster_stats",
    "dedup_shrinkage_by_source",
    "containment_near_dup",
    "lsh_recall_contract",
    "lsh_recall_contract_sampled",
    "split_leakage_safe",
    "similarity_ann_rp_lsh",
    "curation_pipeline_keep",
    "graph_pagerank_neardup",
    "graph_triangle_counts",
    "minhash_estimate_contract",
    "winnow_overlap_pairs",
    "pretrain_data_build",
    "decontaminate_bloom_prefilter",
    "rolling_7d_user_value",
    "dau_wau_engagement",
    "dedup_simhash",
    "dedup_source_syndication",
    "array_hof_breadth_2",
    "bitwise_function_breadth",
    "conditional_null_breadth",
    "json_function_breadth",
    "map_function_breadth",
    "regexp_function_breadth",
    "try_cast_breadth",
    "stats_aggregate_breadth",
    "window_value_functions_breadth",
    "set_operations_all",
    "grouping_sets_priority",
    "ordered_listagg_by_type",
    "countmin_heavy_hitters",
    "heavy_hitters_mg",
    "dataset_card_summary",
    "lm_eval_train_test_split",
    "tpch_q2_max_acctbal_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_priority_case_sum",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_sales_opportunity",
]

#: Tail adjacency: cache-sharing queries registered in different modules
#: otherwise end up ~60 suite positions apart, and the shared persisted
#: relation (8-gram shingles etc.) gets churned by everything in between
#: (measured: the bloom prefilter at the registry tail re-paid the full
#: tokenization, 4.6s -> 13.2s in-suite). Each entry runs immediately
#: AFTER its anchor so the shared cache is hottest. Ordering only — the
#: driver window (first 50) is unaffected.
RUN_AFTER = {
    # entries currently inside DRIVER_WINDOW are no-ops here (the window
    # already orders them); they stay listed so a future rotation that
    # evicts them restores the adjacency automatically.
    "decontaminate_bloom_prefilter": "decontaminate_ngram_exact",
    "hll_distinct_contract": "approx_distinct_users",
    "dataset_mix_temperature": "dataset_mix_by_lang",
    "packing_padding_efficiency": "chunk_documents_overlap",
    "neardup_cluster_stats": "dedup_minhash_lsh",
    "dedup_shrinkage_by_source": "dedup_minhash_lsh",
    # evicted from the r4 window: shares the graph block's shingle +
    # verified-pairs caches (r4 measured 9.5s cold vs 1.4s warm-adjacent)
    "minhash_estimate_contract": "graph_triangle_counts",
    # shares the full-corpus ppjoin_pairs_frame pipeline (tok/prefix
    # caches) with lsh_recall_contract — the r8 in-suite ppjoin
    # regression (4.57 -> 6.50 s while isolated-warm improved) was this
    # adjacency rotating out of reach
    "ppjoin_prefix_similarity": "lsh_recall_contract",
    # shares the persisted winnow fingerprint-array relation (r4 verdict:
    # 4.1 s isolated because the relation was rebuilt per invocation)
    "winnow_overlap_pairs": "text_winnow_fingerprints",
}


def _apply_driver_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    window = set(DRIVER_WINDOW)
    front = {n: QUERIES[n] for n in DRIVER_WINDOW}
    moved = {n: a for n, a in RUN_AFTER.items() if n not in window}
    rest_names = [
        n for n in QUERIES if n not in window and n not in moved
    ]
    # followers whose anchor is INSIDE the window run first after it —
    # the shared relation their anchor persisted is hottest right at the
    # window boundary (ordered by the anchor's window position so a
    # window-tail anchor's follower is exactly adjacent)
    ordered: list[str] = sorted(
        (m for m, a in moved.items() if a in window),
        key=lambda m: DRIVER_WINDOW.index(moved[m]),
    )
    for n in rest_names:
        ordered.append(n)
        ordered.extend(m for m, a in moved.items() if a == n)
    # anchors not registered at all: append at the tail
    ordered.extend(m for m in moved if m not in ordered)
    rest = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)


_apply_driver_window()
