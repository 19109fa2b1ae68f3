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

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50; the one red fixed + re-proven green r4), r4 the never-green
# re-proofs + TPC-H + breadth/sketch/graph/round-3b block (50/50 green),
# r5 the final 50 never-checked entries (50/50 green -> cumulative 200/200
# over the round-4 registry).
# Round 12 window (VERDICT r11 "Next round" #3 — lead with entries
# whose code moves in r12, then retire the full 37-entry r07 vintage,
# filling the remainder from the oldest r08 block; after this window no
# entry's latest verdict predates r08):
# 1. Changed-code entries first: streaming_engagement_sink_equiv (the
#    entry gained a DuckDB oracle + the time-tercile staging redesign +
#    the single-presence-read sink body, VERDICT r11 #1/#2), then
#    dedup_sorted_neighborhood + record_linkage_fellegi_sunter
#    back-to-back (both now compose the session-memoized
#    snm_candidates_shared relation, VERDICT r11 #6 — the builder runs
#    first so the linkage scorer exercises the memo-hit path under the
#    driver's eyes).
# 2. The full 37-entry r07 vintage, grouped by scan family so shared
#    relations stay hot: documents block, embeddings block, events
#    block, orders/customer block (bpe_char_pair_counts immediately
#    before its word_freq_shared sharer bpe_learn_merges, pulled
#    forward from the r08 fill to keep the RUN_AFTER adjacency inside
#    the window).
# 3. ~10 from the oldest r08 block (documents scans, standalone
#    pipelines only — decontaminate_test_split stays OUT: it composes
#    the trigram dedup block's persisted plans and must keep its
#    RUN_AFTER anchor adjacency, the r10 42.7 s scatter lesson).
# Pinned by tests/test_registry_contract so a new registration cannot
# silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # changed-code leads
    "streaming_engagement_sink_equiv",
    "dedup_sorted_neighborhood",
    "record_linkage_fellegi_sunter",
    # r07 vintage: documents scans
    "bm25_lexical_topk",
    "bpe_char_pair_counts",
    "bpe_learn_merges",
    "multimodal_feature_extract",
    "chunk_documents_overlap",
    "dataset_mix_by_lang",
    "decontaminate_ngram_exact",
    "dedup_exact",
    "dedup_keep_best_quality",
    "dedup_simhash_hamming",
    "inverted_index_bigrams",
    "ks_length_drift_by_source",
    "mann_whitney_auc_by_source",
    "quality_percentile_gate",
    "sample_stratified_quota",
    "sample_weighted_topk",
    "sequence_pack_offsets",
    "t_closeness_audit",
    "text_entropy_quality",
    "text_langid_scores",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "text_winnow_fingerprints",
    "train_test_split_stats",
    "word_pair_pmi",
    # r08 fill: documents scans (standalone pipelines)
    "boilerplate_prefix_groups",
    "cms_heavy_hitters",
    "decontaminate_semantic_topmatch",
    "dsir_importance_weights",
    "html_strip_markup",
    "passage_dedup_rewrite",
    "passage_exact_dedup",
    "pii_scrub_counts",
    "text_normalize_clean",
    # r07 vintage: embeddings scans
    "dedup_embedding_cosine",
    "embedding_quantize_int8",
    "similarity_ann_ivf",
    "similarity_ann_ivf_kmeans",
    "similarity_cosine_topk",
    "similarity_mmr_diverse",
    # r07 vintage: events scans
    "asof_join_clicks_views",
    "benford_digit_audit",
    "interval_join_views_clicks",
    "psi_value_drift",
    "sessionize_events",
    # r07 vintage: orders/customer scans
    "range_join_price_bands",
    "scd2_customer_history",
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
