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

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50; the one red fixed + re-proven green r4), r4 the never-green
# re-proofs + TPC-H + breadth/sketch/graph/round-3b block (50/50 green),
# r5 the final 50 never-checked entries (50/50 green -> cumulative 200/200
# over the round-4 registry).
# Round 10 window (VERDICT r9 "Next round" #3 — lead with every entry
# whose code moved THIS round, then retire the r05 vintage; after this
# window no entry's latest verdict predates r06):
# 1. Changed-code entries first: dedup_ngram_jaccard (grouped-
#    intersection verify rewrite in operators/dedup.py), the NEW
#    capped-pairs graph entries (VERDICT r9 #1), and the NEW
#    rows-only streaming-engagement-sink equivalence entry (#5).
# 2. The full 42-entry r05 vintage, grouped by scan family so shared
#    relations stay hot: documents-scan block, embeddings block,
#    distinct-sketch block (approx_distinct_users pulled in as an r06
#    fill so hll_distinct_contract keeps its RUN_AFTER adjacency
#    inside the window), then the events-scan block.
# 3. Remaining fills from the r06 vintage: daily_rollup_events (the
#    flagship), tpch_q1_pricing_summary, window_topk_per_group.
# Pinned by tests/test_registry_contract so a new registration cannot
# silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    "dedup_ngram_jaccard",
    "graph_pagerank_neardup_capped",
    "graph_triangle_counts_capped",
    "streaming_engagement_sink_equiv",
    "code_markdown_signals",
    "doc_unigram_logprob",
    "doc_bigram_interp_logprob",
    "gopher_repetition_flags",
    "quality_repetition_signals",
    "langid_confusion_matrix",
    "token_fertility_by_lang",
    "ngram_bigram_topk",
    "zipf_slope_by_source",
    "source_vocab_jaccard",
    "dup_inflation_by_source",
    "text_fingerprint",
    "shard_pack_by_tokens",
    "packing_padding_efficiency",
    "dataset_mix_temperature",
    "multimodal_payload_meta",
    "label_centroid_cosine",
    "vector_l2_normalize",
    "pandas_zscore_normalize",
    "approx_distinct_users",
    "hll_distinct_contract",
    "cumulative_distinct_users",
    "daily_rollup_events",
    "asof_join_nearest_views",
    "attribution_last_touch",
    "attribution_linear_multi_touch",
    "conversion_wilson_by_day",
    "event_anomaly_zscore",
    "event_transition_matrix",
    "gapfill_daily_interpolation",
    "histogram_event_values",
    "histogram_equidepth_deciles",
    "journey_top_paths",
    "rfm_user_segments",
    "robust_mad_outlier_counts",
    "winsorized_robust_stats",
    "incremental_ingest_dedup",
    "table_checksum_by_flag",
    "zorder_layout_buckets",
    "join_skew_profile",
    "k_anonymity_audit",
    "dq_expectation_checks",
    "profile_table_columns",
    "cube_lang_source_stats",
    "tpch_q1_pricing_summary",
    "window_topk_per_group",
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
