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
from . import round10  # noqa: F401,E402
from . import round11  # noqa: F401,E402
from . import round13  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50; the one red fixed + re-proven green r4), r4 the never-green
# re-proofs + TPC-H + breadth/sketch/graph/round-3b block (50/50 green),
# r5 the final 50 never-checked entries (50/50 green -> cumulative 200/200
# over the round-4 registry).
# Round 13 window (VERDICT r12 "Next round" #2 — lead with entries
# whose code moves in r13, then retire the full remaining 33-entry r08
# vintage, filling the remainder from the oldest r09 block; after this
# window no entry's latest verdict predates r09):
# 1. Changed-code leads: streaming_engagement_sink_equiv (sink redesign
#    round 2 — merged rewrite writes, footer-stats replace_range,
#    day-grain contract, VERDICT r12 #1), scd2_customer_history (its
#    merge() now stages source+survivors as ONE write), and the NEW
#    multimodal_patch_stats entry (VERDICT r12 #5).
# 2. The trigram-minhash block from the oldest r09 vintage, ordered so
#    the designated cache builder (dedup_minhash_lsh) leads and the r08
#    stragglers that compose its persisted relations
#    (ppjoin_prefix_similarity after lsh_recall_contract — the r8 fix —
#    and decontaminate_test_split) sit inside the block, preserving
#    their RUN_AFTER adjacencies inside the window.
# 3. The rest of the 33-entry r08 vintage grouped by scan family
#    (documents, embeddings, events, scalar/dimension), with
#    multimodal_frame_offsets adjacent to the new patch-stats entry
#    (same binary-payload scan).
# 4. Remaining slots from the oldest r09 block: standalone events/TPC-H
#    scans.
# Pinned by tests/test_registry_contract so a new registration cannot
# silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # changed-code leads
    "streaming_engagement_sink_equiv",
    "scd2_customer_history",
    # r09 trigram-minhash block (anchor first; cache-sharing followers
    # adjacent — RUN_AFTER is a no-op inside the window, so the order
    # here IS the adjacency)
    "dedup_minhash_lsh",
    "minhash_estimate_contract",
    "lsh_recall_contract",
    "ppjoin_prefix_similarity",  # r08; shares ppjoin_pairs_frame w/ above
    "decontaminate_test_split",  # r08; composes the block's persisted plans
    "lsh_recall_contract_sampled",
    "dedup_clusters",
    "dedup_shrinkage_by_source",
    "neardup_cluster_stats",
    "graph_pagerank_neardup",
    "graph_triangle_counts",
    # r09 embeddings: the sign-LSH band-index builder (its follower
    # dedup_semantic_prune re-anchors via RUN_AFTER just past the window)
    "similarity_ann_rp_lsh",
    # r08 embeddings scans
    "embedding_outlier_scores",
    "hard_negative_topk",
    "kmv_join_cardinality",
    "pca_power_iteration",
    # r08 documents scans (standalone pipelines)
    "sample_hash_bernoulli",
    "source_unigram_kl",
    "text_token_counts",
    "url_extract_normalize",
    "vocab_oov_rate",
    "bloom_membership_check",
    # r08 events scans
    "date_filter_single_day",
    "distinct_exact",
    "error_capture_routing",
    "filter_dispatch",
    "grouping_rollup",
    "pivot_daily_event_values",
    "retention_keep_side",
    "set_operations",
    "unpivot_event_metrics",
    "window_running_analytics",
    "order_limit_topn",
    # r09 fill: standalone events/orders scans
    "dau_wau_engagement",
    "rolling_7d_user_value",
    "set_operations_all",
    # (tpch_q4_order_priority stays on its r09 verdict — swapped out for
    # the new frame-energy entry; the no-pre-r09 goal is unaffected)
    # r08 scalar/dimension scans
    "base64_roundtrip",
    "broadcast_route_lookup",
    "join_anti",
    "join_semi",
    "log_path_and_format",
    "path_stem_extract",
    "regex_filename_cleanup",
    "sql_api_passthrough",
    "uuid_stable",
    # r08 multimodal plumbing + the NEW r13 analytic over the same
    # binary payloads (adjacent: same documents/multimodal scan)
    "multimodal_frame_offsets",
    "multimodal_patch_stats",
    "multimodal_frame_energy",  # NEW r13: audio sibling, same scan
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
    # --- the trigram-minhash dedup block (VERDICT r9 #4): every
    # consumer of the shared trigram shingle / wide-signature /
    # verified-pairs caches anchors FLAT on dedup_minhash_lsh, so the
    # cache build always lands on the designated first entry and
    # in-suite times stop flapping with rotation (r8<->r9 measured
    # dedup_minhash_lsh 2.3<->8.1 s purely by which query built the
    # cache first). Dict order = suite order after the anchor; chains
    # (follower anchoring on a follower) are NOT supported by
    # _apply_driver_window — keep this flat. lsh_recall_contract sits
    # immediately before ppjoin_prefix_similarity, preserving the r8
    # fix (they share the full-corpus ppjoin_pairs_frame pipeline).
    "neardup_cluster_stats": "dedup_minhash_lsh",
    "dedup_shrinkage_by_source": "dedup_minhash_lsh",
    "dedup_clusters": "dedup_minhash_lsh",
    "dedup_clusters_star": "dedup_minhash_lsh",
    "graph_pagerank_neardup": "dedup_minhash_lsh",
    "graph_triangle_counts": "dedup_minhash_lsh",
    # shares the graph block's shingle + verified-pairs caches (r4
    # measured 9.5s cold vs 1.4s warm-adjacent)
    "minhash_estimate_contract": "dedup_minhash_lsh",
    "lsh_recall_contract": "dedup_minhash_lsh",
    "ppjoin_prefix_similarity": "dedup_minhash_lsh",
    # r10 bench finding: the window rotation scattered these family
    # members 60-100 suite positions from their relation builders, and
    # each re-paid its full cold build late in the session where the
    # accumulated storage region turns the rebuild into eviction thrash
    # (lsh_recall_contract_sampled: 2.9 s in-suite r9 -> 42.7 s r10).
    # test_split composes the block's persisted trigram-shingle /
    # signature plans verbatim (same 8/2/3 params) — CacheManager hits.
    # The SAMPLED contract's plans sit atop its 20% hash-filtered docs,
    # so nothing CacheManager-shares; its adjacency buys locality only
    # (documents page cache + the block's JVM-warm codegen), which is
    # what its r9 in-suite 2.9 s vs scattered 42.7 s measured.
    "decontaminate_test_split": "dedup_minhash_lsh",
    "lsh_recall_contract_sampled": "dedup_minhash_lsh",
    # both compose emb_bands_shared (llm_ops) — one session-persisted
    # sign-LSH band index; the follower's Arrow signature UDF pass is a
    # cache hit (in-suite 3.4 s r9 -> 30.6 s r10 when scattered to tail)
    "dedup_semantic_prune": "similarity_ann_rp_lsh",
    # both compose _dsir_scored_shared (round7) — one session-persisted
    # scored relation; the follower's scoring pipeline is a cache hit
    "dsir_select_topp": "dsir_importance_weights",
    # learner + encoder compose word_freq_shared (round3) — one
    # session-persisted word-frequency relation; anchoring both on the
    # char-pair entry keeps the flat-anchor rule while making the two
    # sharers adjacent to EACH OTHER (cpc itself is a different pipeline
    # over the same documents scan — locality only)
    "bpe_learn_merges": "bpe_char_pair_counts",
    "bpe_apply_encode": "bpe_char_pair_counts",
    # shares the persisted winnow fingerprint-array relation (r4 verdict:
    # 4.1 s isolated because the relation was rebuilt per invocation)
    "winnow_overlap_pairs": "text_winnow_fingerprints",
    # the scrub composes the finder's spans plan verbatim, so its
    # persisted repeated-gram relation (positioned xxhash64 grams,
    # occurrence-banded) is a CacheManager hit when adjacent
    "dedup_span_scrub": "dedup_repeated_spans",
    # both compose snm_candidates_shared (round6b) — one
    # session-memoized persisted SNM pair relation; the linkage scorer
    # was the in-suite GC-stall victim two rounds running when it
    # rebuilt the block from scratch at max heap debt (VERDICT r11 #6)
    "record_linkage_fellegi_sunter": "dedup_sorted_neighborhood",
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
