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

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50 green; sessionize_events red on a DuckDB-HUGEINT oracle type, fixed
# this round). Round 4 window = the two never-green entries re-proven
# (sessionize_events after the CAST-to-BIGINT oracle fix;
# array_higher_order_breadth after the r01 driver-canonicalizer array fix)
# plus 48 never-driver-checked entries: the four latent HUGEINT-oracle fixes
# (source_unigram_kl, bpe_learn_merges, rolling_7d_user_value,
# pretrain_data_build), all 13 unchecked TPC-H shapes, the function-breadth
# suites, sketches, graph, and the round-3b text/similarity block. The 50
# still-unchecked entries (43 from round 3 + the 7 round-4 additions)
# rotate in round 5 — exact list in COVERAGE.md. Pinned by
# tests/test_registry_contract so a new registration cannot silently evict
# driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # never-green entries, re-proven after their fixes
    "sessionize_events",
    "array_higher_order_breadth",
    # latent HUGEINT-oracle fixes (same class as sessionize_events)
    "source_unigram_kl",
    "bpe_learn_merges",
    "rolling_7d_user_value",
    "pretrain_data_build",
    # TPC-H shapes never driver-checked
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
    # windows / set ops / function-breadth suites
    "grouping_sets_priority",
    "ordered_listagg_by_type",
    "window_running_analytics",
    "window_value_functions_breadth",
    "set_operations_all",
    "array_hof_breadth_2",
    "map_function_breadth",
    "try_cast_breadth",
    "bitwise_function_breadth",
    "conditional_null_breadth",
    "regexp_function_breadth",
    "json_function_breadth",
    "stats_aggregate_breadth",
    # sketches
    "countmin_heavy_hitters",
    "heavy_hitters_mg",
    "kmv_join_cardinality",
    # graph over the near-dup edge relation
    "graph_pagerank_neardup",
    "graph_triangle_counts",
    # runs right after the graph block: shares its shingle + verified-pairs
    # caches while they are hottest (in-suite cost is position-dependent)
    "minhash_estimate_contract",
    # round-3b text / similarity block
    "ppjoin_prefix_similarity",
    "pca_power_iteration",
    "bpe_apply_encode",
    "winnow_overlap_pairs",
    "containment_near_dup",
    "passage_exact_dedup",
    "passage_dedup_rewrite",
    "embedding_outlier_scores",
    "hard_negative_topk",
    "dedup_semantic_prune",
    "lm_eval_train_test_split",
    "dataset_card_summary",
]

#: Tail adjacency: cache-sharing queries registered in different modules
#: otherwise end up ~60 suite positions apart, and the shared persisted
#: relation (8-gram shingles etc.) gets churned by everything in between
#: (measured: the bloom prefilter at the registry tail re-paid the full
#: tokenization, 4.6s -> 13.2s in-suite). Each entry runs immediately
#: AFTER its anchor so the shared cache is hottest. Ordering only — the
#: driver window (first 50) is unaffected.
RUN_AFTER = {
    "decontaminate_bloom_prefilter": "decontaminate_ngram_exact",
    "hll_distinct_contract": "approx_distinct_users",
    "dataset_mix_temperature": "dataset_mix_by_lang",
    "packing_padding_efficiency": "chunk_documents_overlap",
    "neardup_cluster_stats": "dedup_minhash_lsh",
    "dedup_shrinkage_by_source": "dedup_minhash_lsh",
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
    ordered: list[str] = []
    for n in rest_names:
        ordered.append(n)
        ordered.extend(m for m, a in moved.items() if a == n)
    # anchors inside the window (or missing): append at the tail
    ordered.extend(m for m in moved if m not in ordered)
    rest = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)


_apply_driver_window()
