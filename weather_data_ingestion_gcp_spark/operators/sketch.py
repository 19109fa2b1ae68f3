"""Portable Bloom-filter membership sketch.

The sketch is a RELATION: the distinct set of hash positions lit by the
build side's keys — at most ``m`` rows regardless of build cardinality,
so it broadcasts. Hashing is k disjoint 16-bit slices of md5 (no
engine-native hash functions), making the sketch bit-for-bit reproducible
across engines, runs, and partitionings — the same portability contract
as the KMV sketch and the hash samplers.

No false negatives by construction: a probed key whose positions were all
lit by an identical build key always reports maybe_member. False-positive
rate is the standard (1 - e^{-kn/m})^k.

This is the DATA-level bloom (a query you can run and oracle-check); the
PLAN-level analog — Spark's runtime bloom-filter join pruning injecting
might_contain on the probe side — is pinned in tests/test_scale_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: k hash positions from disjoint 16-bit md5 slices -> m = 65536 bits.
BLOOM_K = 4
BLOOM_M = 1 << 16


def bloom_positions(key: Column) -> list[Column]:
    """k position columns in [0, m) for a key: nibble-group slices of its
    md5, converted via base-16 string conv (portable to any SQL dialect)."""
    fp = F.md5(key)
    return [
        F.conv(F.substring(fp, 4 * j + 1, 4), 16, 10).cast("long")
        for j in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the bit-set relation: one row per DISTINCT lit position
    (column ``pos``). Bounded by m rows — always broadcastable."""
    return (
        df.select(F.explode(F.array(*bloom_positions(F.col(key_col)))).alias("pos"))
        .distinct()
    )


def bloom_probe(df: DataFrame, bits: DataFrame, id_col: str, key_col: str) -> DataFrame:
    """Probe: per row, how many of its k positions are lit, and the
    maybe_member verdict (all k lit). The join is a broadcast of the
    bit set against a map-side explode of the probe keys — the probe
    relation never shuffles."""
    probe = df.select(
        F.col(id_col),
        F.explode(F.array(*bloom_positions(F.col(key_col)))).alias("pos"),
    )
    return (
        probe.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            id_col,
            "n_hits",
            (F.col("n_hits") == BLOOM_K).cast("int").alias("maybe_member"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters / frequency estimation)
# ---------------------------------------------------------------------------

#: d independent hash rows x w buckets -> d*w cells total.
CMS_D = 4
CMS_W = 256


def cms_bucket(key: Column, seed: int) -> Column:
    """Bucket in [0, w) for one hash row: 16-bit md5 slice of the seeded
    key, mod w — portable (md5 + base conversion only) like the Bloom and
    KMV sketches, so estimates reproduce bit-for-bit anywhere."""
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % CMS_W).alias("bucket")


def countmin_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch: (seed, bucket, c) cell counts. At most d*w rows
    (1024 here) regardless of input cardinality — a bounded, broadcastable,
    MERGEABLE summary (cells of two sketches add), which is what makes it
    the streaming/distributed frequency sketch."""
    sb = F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"), cms_bucket(F.col(key_col), s).alias("bucket")
            )
            for s in range(CMS_D)
        ]
    )
    return (
        df.select(F.explode(sb).alias("sb"))
        .select("sb.seed", "sb.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def countmin_estimate(cells: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """Estimate each probe key's frequency: MIN over the d rows of its
    cell counts (classic CMS upper-bound estimate; never underestimates).
    The sketch side broadcasts; the probe side never shuffles."""
    sb = F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"), cms_bucket(F.col(key_col), s).alias("bucket")
            )
            for s in range(CMS_D)
        ]
    )
    probe = probes.select(F.col(key_col), F.explode(sb).alias("sb")).select(
        key_col, "sb.seed", "sb.bucket"
    )
    return (
        probe.join(F.broadcast(cells), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est_count"))
    )
