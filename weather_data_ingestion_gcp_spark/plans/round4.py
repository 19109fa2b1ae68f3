"""Round-4 additions: the broadcast-bloom decontamination prefilter and
native-sketch accuracy contracts.

Both are scale-path operators for the training-data pipeline (the same
family as plans/llm_ops.py): the bloom entry is the shape that survives
100 TB — prune the big side map-side against a bounded broadcast bitset
BEFORE any shuffle — and the HLL entry pins Spark's built-in
approx_count_distinct against exact counts, the measured-not-assumed
contract pattern of lsh_recall_contract / minhash_estimate_contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, sketch
from ..operators.sampling import hash_bucket
from .llm_ops import _SQL_DOCID_BUCKET, _SQL_SHINGLES8
from .registry import load_table, register


@register(
    "decontaminate_bloom_prefilter",
    oracle=rf"""
    WITH sh AS ({_SQL_SHINGLES8}),
    split AS (SELECT doc_id, {_SQL_DOCID_BUCKET} AS b FROM documents),
    te AS (SELECT sh.doc_id AS test_id, shingle
           FROM sh JOIN split USING (doc_id) WHERE split.b < 10),
    tr AS (SELECT sh.doc_id AS train_id, shingle
           FROM sh JOIN split USING (doc_id) WHERE split.b >= 15),
    kept AS (SELECT shingle FROM tr GROUP BY shingle HAVING COUNT(*) <= 50),
    pairs AS (
        SELECT te.test_id, tr.train_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM te JOIN kept USING (shingle) JOIN tr USING (shingle)
        GROUP BY te.test_id, tr.train_id
        HAVING COUNT(*) >= 2
    )
    SELECT test_id,
           CAST(COUNT(*) AS BIGINT) AS n_train_docs,
           CAST(SUM(c) AS BIGINT) AS shared_grams_total
    FROM pairs GROUP BY test_id ORDER BY test_id
    """,
)
def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a broadcast-bloom prefilter — the 100 TB
    shape of decontaminate_ngram_exact. The test split's 8-grams fold
    into a packed 2^20-bit bloom (bounded 128 KB driver collect and
    broadcast, regardless of corpus size); train grams are pruned
    MAP-SIDE by pure bit arithmetic before the equi-join, so the
    shuffle carries only maybe-contaminating grams instead of the whole
    train corpus. The bloom has no false negatives (identical md5
    arithmetic both sides) and the exact join removes its false
    positives, so the prefilter is result-transparent — the oracle is
    the plain exact-overlap SQL, and the plan pin in
    tests/test_scale_plans.py is what proves the prune actually sits
    under the join. Output is the per-test-document contamination
    summary a curation pipeline keys its drop list off."""
    d = load_table(spark, sf_dir, "documents")
    # shares the persisted 8-gram relation with decontaminate_ngram_exact
    sh = dedup.persist_tracked(dedup.shingles(d, "doc_id", "text", n=8))
    b = hash_bucket(F.col("doc_id"))
    te = sh.join(d.filter(b < 10).select("doc_id"), "doc_id", "left_semi")
    tr = sh.join(d.filter(b >= 15).select("doc_id"), "doc_id", "left_semi")
    words = sketch.bloom_bitset_words(te, "shingle")
    tr_pruned = sketch.bloom_xl_prune(tr, "shingle", words)
    out = dedup.ngram_exact_overlap(te, tr_pruned, min_shared=2, max_gram_df=50)
    return (
        out.groupBy(F.col("probe_id").alias("test_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_docs"),
            F.sum("shared_grams").cast("long").alias("shared_grams_total"),
        )
        .orderBy("test_id")
    )


@register(
    "hll_distinct_contract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def hll_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for Spark's native HyperLogLog++
    (approx_count_distinct at rsd=0.05): per event type, the exact
    distinct-user count plus a measured |approx - exact| / exact <= 3*rsd
    verdict. The oracle cannot reproduce Spark's HLL register values, so
    the approximate count itself stays out of the output — what IS
    hash-checked is the exact count and the claim that the sketch met
    its error bound on this data (the lsh_recall_contract pattern:
    sketch accuracy measured, not assumed). At 100 TB the HLL side is
    the one that matters: partial sketches merge map-side, so the
    exchange carries fixed-size registers, not user_id sets."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.05).alias("_approx"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.15
        ).alias("within_bound"),
    ).orderBy("event_type")
