"""Empirical 10x scale probe (VERDICT r5 task 3).

Runs a fixed list of the most expensive documents/events/embeddings
queries at one sf dir, each COLD then WARM (second run, shared caches
hot), and prints one JSON line. Run it once per SF in SEPARATE processes
(session-persisted caches must not leak across data scales):

    python tools/scale_probe.py /root/testdata/sf0.1   > /tmp/probe01.json
    python tools/scale_probe.py .scaleprobe/sf1        > /tmp/probe1.json
    python tools/scale_probe.py --compare /tmp/probe01.json /tmp/probe1.json

--compare emits the per-query scaling exponent table for BASELINE.md:
exponent = log(t_sf1 / t_sf0.1) / log(data_scale) on the warm times —
1.0 is linear, < 1 sub-linear (fixed overhead or caps binding), > 1
super-linear (needs a written explanation or a fix). data_scale is 10
(documents/events grow 10x per probe step) except for the
embeddings-family queries, whose table grows only 4x (the generator's
own measured law) — those use log(4) so the exponent means the same
thing in every row.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

PROBE_QUERIES = [
    # the top-10 isolated-warm from BENCH_FULL r5, all documents/
    # embeddings-family, plus one events-family representative each for
    # scan-agg (daily_rollup_events) and window (sessionize_events)
    "dedup_clusters_star",
    "graph_pagerank_neardup",
    "decontaminate_bloom_prefilter",
    "similarity_ann_ivf_kmeans",
    "dedup_ngram_jaccard",
    "decontaminate_ngram_exact",
    "minhash_estimate_contract",
    "neardup_cluster_stats",
    # NOT lsh_recall_contract: its full-corpus PPJoin ground truth is
    # quadratic under the generator's fixed vocabulary and spilled >80 GB
    # at sf1 (the probe's first real finding — see BASELINE.md round 6);
    # the sampled companion is the scale path and is probed instead
    "lsh_recall_contract_sampled",
    "bpe_char_pair_counts",
    "dedup_simhash",
    "dedup_semantic_prune",
    "dedup_minhash_lsh",
    "daily_rollup_events",
    "sessionize_events",
    # round-6 extension: one representative per remaining family so the
    # exponent table spans text analytics, sampling/mixing, events
    # windows/attribution, skew handling, and the new r6 entries
    "text_langid_scores",
    "word_pair_pmi",
    "text_winnow_fingerprints",
    "source_distinctive_terms",
    "mix_apply_temperature",
    "training_shuffle_shards",
    "dau_wau_engagement",
    "attribution_linear_multi_touch",
    "event_anomaly_zscore",
    "histogram_equidepth_deciles",
    "skew_adaptive_salted_agg",
    "rouge_overlap_eval",
    "rerank_two_stage_topk",
    # round-6b entries: SNM claims strictly-linear candidates; EWMA and
    # l-diversity are events-family window/agg representatives
    "dedup_sorted_neighborhood",
    "ewma_daily_event_value",
    "l_diversity_audit",
    # round-7 entries: DSIR's bounded-model selector and the PSI grid
    "dsir_importance_weights",
    "psi_value_drift",
    # round-8 entries: the DSIR apply half (global range-partitioned
    # rank) and the CMS frequency sketch (bounded 4096-cell broadcast)
    "dsir_select_topp",
    "cms_heavy_hitters",
    # round-11 entries: the occurrence-banded repeated-span finder (its
    # first cut measured super-linear exactly here — keep it probed)
    "dedup_repeated_spans",
]


#: queries whose input table is embeddings (EMB_X=4 per probe step, vs
#: 10x for documents/events) — their exponent denominator is log(4)
_EMBEDDINGS_FAMILY = {
    "similarity_ann_ivf_kmeans",
    "dedup_semantic_prune",
    "rerank_two_stage_topk",
}


def run(sf_dir: str, subset: list[str] | None = None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from weather_data_ingestion_gcp_spark.plans import QUERIES
    from weather_data_ingestion_gcp_spark.session import get_spark

    sp = os.environ.get("SPARK_GRAFT_PROBE_SHUFFLE")
    spark = get_spark(
        "scale-probe", shuffle_partitions=int(sp) if sp else None
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warm-up with a query OUTSIDE the probe list, so the probe's own
    # first entry still records a genuine cold time
    QUERIES["order_limit_topn"](spark, sf_dir).collect()

    # SPARK_GRAFT_PROBE_SINK=noop: execute through the no-op batch sink
    # instead of collecting to the driver — for queries whose OUTPUT is
    # corpus-sized (sessionize: one row per session), where toArrow()
    # hits spark.driver.maxResultSize at sf100 purely as a harness
    # artifact (a real pipeline lands such results in a table). Rows
    # are then counted in a separate (untimed) pass.
    noop = os.environ.get("SPARK_GRAFT_PROBE_SINK") == "noop"

    def execute(df) -> int:
        if noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.toArrow().num_rows

    out: dict[str, dict] = {}
    for name in (subset or PROBE_QUERIES):
        fn = QUERIES[name]
        spark._jvm.System.gc()
        try:
            t0 = time.time()
            n = execute(fn(spark, sf_dir))
            cold = time.time() - t0
            t0 = time.time()
            execute(fn(spark, sf_dir))
            warm = time.time() - t0
            if noop:
                n = fn(spark, sf_dir).count()
        except Exception as exc:  # a blown query must not kill the probe
            out[name] = {"error": f"{type(exc).__name__}"}
            print(f"# {name}: ERROR {type(exc).__name__}", file=sys.stderr)
            continue
        out[name] = {"cold": round(cold, 3), "warm": round(warm, 3), "rows": n}
        print(f"# {name}: cold {cold:.2f}s warm {warm:.2f}s ({n} rows)",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    return 0


def compare(a_path: str, b_path: str) -> int:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    print(f"| query | {a['sf_dir']} warm | {b['sf_dir']} warm | exponent | rows 1x -> 10x |")
    print("|---|---|---|---|---|")
    for name, qa in a["queries"].items():
        qb = b["queries"].get(name)
        if not qb or "warm" not in qa or "warm" not in qb:
            err = (qa.get("error") or (qb or {}).get("error")) if qb else "missing"
            print(f"| {name} | — | — | BLOWN ({err}) | — |")
            continue
        scale = 4 if name in _EMBEDDINGS_FAMILY else 10
        exp = math.log(
            max(qb["warm"], 1e-3) / max(qa["warm"], 1e-3)
        ) / math.log(scale)
        print(
            f"| {name} | {qa['warm']:.2f}s | {qb['warm']:.2f}s "
            f"| {exp:.2f} (x{scale}) | {qa['rows']} -> {qb['rows']} |"
        )
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "--compare":
        sys.exit(compare(sys.argv[2], sys.argv[3]))
    sys.exit(run(sys.argv[1], sys.argv[2:] or None))
