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
# Round 8 window (VERDICT r7 "Next round" #2, evidence-freshness burn-
# down — after this window no entry's latest verdict predates r04 or its
# current code):
# 1. Entries whose CODE or ORACLE changed this round and must re-prove:
#    decontaminate_semantic_topmatch (tile-folded argmax + zero-norm
#    guard on plan AND oracle), the SNM pair (pid-stamped relation now
#    persisted — plan changed, output pinned identical),
#    decontaminate_bloom_prefilter (r7 adaptive-width bloom + this
#    round's Arrow bitset path landed AFTER its last r5 verdict — the
#    one entry VERDICT r7 names whose green predates its code), and
#    dsir_importance_weights (its scoring chain was refactored into the
#    shared dsir_scored_docs helper).
# 2. The round-8 registration: dsir_select_topp.
# 3. error_capture_routing — the last r01-only verdict.
# 4. The full r02 vintage (19: one-expression scalars + join_semi/
#    join_anti/set_operations/distinct_exact/grouping_rollup/pivot/
#    unpivot/bloom_membership_check...).
# 5. The full r03 vintage (11 map-only shapes left out of the r7
#    rotation: text_normalize_clean, html_strip_markup, ...).
# 6. Fill to 50 with r04 vintage, riskier classes first (similarity/
#    passage/PPJoin/containment float-and-ln comparators, BPE, KL,
#    PCA, window analytics); rolling_7d_user_value — integer window
#    sums, unit-pinned — yielded its slot to the cms_heavy_hitters
#    registration and re-confirms in r9. Entries whose shared caches'
#    anchors
#    rotated out of the window are deferred to r9 (winnow_overlap_
#    pairs, minhash_estimate_contract, graph pair) so the driver bench
#    doesn't pay cold cache rebuilds mid-window.
# Ordering: changed-code entries first (freshest evidence for the
# newest code), then the new registration, then vintage oldest-first;
# documents-scan entries adjacent, embeddings entries adjacent.
# Pinned by tests/test_registry_contract so a new registration cannot
# silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # code/oracle changed this round -> re-prove under the driver
    "decontaminate_semantic_topmatch",
    "dedup_sorted_neighborhood",
    "record_linkage_fellegi_sunter",
    "decontaminate_bloom_prefilter",
    "dsir_importance_weights",
    # round-8 registrations (the DSIR apply half shares the scored-pool
    # chain with dsir_importance_weights just above; the CMS sketch is a
    # documents-scan entry, adjacent to the text block below)
    "dsir_select_topp",
    "cms_heavy_hitters",
    # last r01-only verdict
    "error_capture_routing",
    # --- r02 vintage (19) ---
    "base64_roundtrip",
    "bloom_membership_check",
    "broadcast_route_lookup",
    "date_filter_single_day",
    "distinct_exact",
    "filter_dispatch",
    "grouping_rollup",
    "join_anti",
    "join_semi",
    "log_path_and_format",
    "order_limit_topn",
    "path_stem_extract",
    "pivot_daily_event_values",
    "regex_filename_cleanup",
    "retention_keep_side",
    "set_operations",
    "sql_api_passthrough",
    "unpivot_event_metrics",
    "uuid_stable",
    # --- r03 vintage (11 map-only shapes) ---
    "text_normalize_clean",
    "html_strip_markup",
    "url_extract_normalize",
    "text_token_counts",
    "pii_scrub_counts",
    "boilerplate_prefix_groups",
    "vocab_oov_rate",
    "decontaminate_test_split",
    "sample_hash_bernoulli",
    "multimodal_decode_meta",
    "multimodal_frame_offsets",
    # --- r04 vintage fill (13) ---
    # documents-scan family together
    "ppjoin_prefix_similarity",
    "containment_near_dup",
    "passage_exact_dedup",
    "passage_dedup_rewrite",
    "source_unigram_kl",
    "bpe_learn_merges",
    "bpe_apply_encode",
    # embeddings family together
    "hard_negative_topk",
    "embedding_outlier_scores",
    "pca_power_iteration",
    # events/orders analytics
    "window_running_analytics",
    "kmv_join_cardinality",
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
