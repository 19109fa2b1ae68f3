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

# ---------------------------------------------------------------------------
# Driver-visible ordering. The correctness driver hard-checks the FIRST 50
# registry entries each round, so ordering is evidence allocation. Rotation
# history: r1-r2 reference-surface queries (green), r3 the LLM-pipeline block
# (49/50; the one red fixed + re-proven green r4), r4 the never-green
# re-proofs + TPC-H + breadth/sketch/graph/round-3b block (50/50 green),
# r5 the final 50 never-checked entries (50/50 green -> cumulative 200/200
# over the round-4 registry).
# Round 7 window = the four round-6d registrations (registered in the r6
# end-of-round snapshot AFTER the window froze — the one never-driver-
# checked block VERDICT r6 names; benford additionally carries this
# round's nullif empty-input fix), plus dedup_sorted_neighborhood and
# record_linkage_fellegi_sunter (their shared candidate generator was
# RE-SHAPED this round — range-partitioned two-pass rank per VERDICT r6
# "What's wrong" #2; output is rank-identical by construction and the
# value-level pin proves it, but the plan changed, so they re-prove under
# the driver), plus any round-7 registrations, plus re-confirmations of
# the OLDEST remaining vintage: the r03 window (LLM-pipeline block —
# it predates the r4-r6 shared-cache, session, and memoization changes).
# Entries left out of the r03 re-confirmation block to make room
# (deterministic string/integer map-only shapes, each unit-pinned and
# green in the r7 full parity sweep): text_normalize_clean,
# html_strip_markup, url_extract_normalize, multimodal_frame_offsets,
# sample_hash_bernoulli, vocab_oov_rate, decontaminate_test_split,
# text_token_counts, pii_scrub_counts, boilerplate_prefix_groups,
# multimodal_decode_meta (real-bytes decode pinned by its unit suite) —
# no floats, no shared caches, deterministic string/count/byte shapes. Every riskier r03 class
# (dedup family with shared shingle caches, ANN/similarity float
# comparators, BM25/TF-IDF/PMI ln-scored rankers, as-of/interval/range
# joins, SCD2) re-confirms.
# Ordering: round-6d first, then the re-shaped SNM pair, then round-7
# registrations, then the r03 block in its original cache-aware order
# (documents-scan dedup family together, text-analysis together,
# multimodal together, joins last). dedup_minhash_lsh, chunk_documents_
# overlap, text_winnow_fingerprints, dataset_mix_by_lang and
# decontaminate_ngram_exact are RUN_AFTER anchors: their evicted
# followers run immediately after the window with the shared relations
# still hot. Pinned by tests/test_registry_contract so a new
# registration cannot silently evict driver coverage.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # round-6d registrations (never driver-checked; benford carries the
    # r7 nullif fix)
    "benford_digit_audit",
    "ks_length_drift_by_source",
    "mann_whitney_auc_by_source",
    "t_closeness_audit",
    # candidate generator re-shaped this round (range-partitioned rank)
    "dedup_sorted_neighborhood",
    "record_linkage_fellegi_sunter",
    # round-7 registrations (DSIR importance weights, PSI drift)
    "dsir_importance_weights",
    "psi_value_drift",
    # oracle changed this round (absolute sample-size cap after the
    # 100x probe): needs a fresh verdict
    "lsh_recall_contract_sampled",
    "dedup_semantic_prune",
    "decontaminate_semantic_topmatch",
    # --- re-confirmations: r03 window (LLM-pipeline block), oldest
    # remaining vintage, original cache-aware ordering ---
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_keep_best_quality",
    "dedup_simhash_hamming",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "decontaminate_ngram_exact",
    "curation_pipeline_keep",
    "similarity_cosine_topk",
    "similarity_ann_rp_lsh",
    "similarity_ann_ivf",
    "similarity_ann_ivf_kmeans",
    "similarity_mmr_diverse",
    "embedding_quantize_int8",
    "bm25_lexical_topk",
    "text_tfidf_top_terms",
    "inverted_index_bigrams",
    "text_winnow_fingerprints",
    "word_pair_pmi",
    "bpe_char_pair_counts",
    "text_langid_scores",
    "text_quality_scores",
    "text_entropy_quality",
    "quality_percentile_gate",
    "chunk_documents_overlap",
    "sequence_pack_offsets",
    "sample_stratified_quota",
    "sample_weighted_topk",
    "train_test_split_stats",
    "dataset_mix_by_lang",
    "multimodal_feature_extract",
    "asof_join_clicks_views",
    "interval_join_views_clicks",
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
