"""Round-10 registry entries.

streaming_engagement_sink_equiv makes the foreachBatch engagement sink
(streaming/engagement.py) driver-visible: the sink is a non-SQL surface
(stateful multi-commit table maintenance), so the entry registers
WITHOUT an oracle — the driver records the weaker rows-only check — but
the returned frame ENFORCES its own equivalence verdict: every profile
row is compared against the batch-grain answer computed by the same
operators/temporal.daily_engagement over the identical presence
relation, and a disagreement or a day present on only one side raises
at execution (raise_error), turning the driver's rows-only row into err
instead of a green frame full of false verdicts (round-10 VERDICT
"What's wrong" #1; a missing day additionally changes the row count the
driver pins).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_table, register

#: scratch root for the sink's txlog tables — under the repo (never the
#: shared /tmp of a multi-user box), gitignored, recreated per run
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


@register("streaming_engagement_sink_equiv")  # no oracle: non-SQL surface
def streaming_engagement_sink_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the incremental DAU/WAU engagement sink over a staged
    3-batch split of the events table (deterministic user-hash split, so
    every batch interleaves late and repeated days) against fresh txlog
    tables, then return the final profile with a per-day
    ``agrees_with_batch`` verdict against the batch-grain computation
    over the same presence relation.

    The equivalence is structural, not luck: a day's profile row is last
    written by the last batch whose blast radius [min_d, max_d+6]
    covers it, and no later batch can append a presence row affecting
    that day (a row at day p only affects [p, p+6], inside its own
    batch's radius) — so the last writer saw every relevant presence
    row. The 3-way split exercises exactly that argument.

    Scale: the sink's per-batch work is the anti-join of the batch's
    (user, day) pairs plus a day-scoped recompute — O(batch + affected
    slice), never O(table); the final comparison is one join on the
    O(distinct days) profile."""
    from ..operators.temporal import daily_engagement
    from ..sources.txlog import TxLogTable
    from ..streaming.engagement import engagement_sink

    # The sink's unit of work is distinct (user, day) presence — dedupe
    # to that grain ONCE and persist it, instead of letting each of the
    # three staged batches re-scan the events parquet for every action
    # the sink runs (bounds agg + anti-join + recompute = ~6 scans).
    # ``ts`` stays the column name: to_date over an already-DATE column
    # is a pass-through, so the sink body is exercised unchanged.
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("ts"))
        .distinct()
        .withColumn("_b", F.pmod(F.xxhash64("user_id"), F.lit(3)))
        .persist()
    )
    os.makedirs(_SCRATCH, exist_ok=True)
    root = tempfile.mkdtemp(prefix="engagement_sink_", dir=_SCRATCH)
    # previous runs' scratch is dead weight once a new run starts — keep
    # the directory bounded instead of leaking one tree per invocation
    for old in os.listdir(_SCRATCH):
        p = os.path.join(_SCRATCH, old)
        if p != root and old.startswith("engagement_sink_"):
            shutil.rmtree(p, ignore_errors=True)
    presence = TxLogTable(os.path.join(root, "presence"))
    profile = TxLogTable(os.path.join(root, "profile"))
    sink = engagement_sink(presence, profile, "driver-equiv")
    for i in range(3):
        sink(e.filter(F.col("_b") == i).drop("_b"), i)
    # everything below reads from the txlog tables the sink wrote, not
    # from the staged input — release it before building the result plan
    e.unpersist()

    def _read_or_empty(t: TxLogTable, ddl: str) -> DataFrame:
        # empty input: the sink commits empty batches (txn monotonicity)
        # but never writes the profile, and TxLogTable.read raises on a
        # file-less table — degrade to empty typed frames
        if not t.exists() or not t.active_files():
            return spark.createDataFrame([], ddl)
        return t.read(spark)

    prof = _read_or_empty(
        profile, "d date, dau bigint, wau bigint, stickiness double"
    )
    batch = daily_engagement(
        _read_or_empty(presence, "user_id bigint, d date")
        .select("user_id", "d")
    )
    b = batch.select(
        "d",
        F.col("dau").alias("_bd"),
        F.col("wau").alias("_bw"),
        F.col("stickiness").alias("_bs"),
    )
    agrees = (
        F.col("dau").eqNullSafe(F.col("_bd"))
        & F.col("wau").eqNullSafe(F.col("_bw"))
        & F.col("stickiness").eqNullSafe(F.col("_bs"))
    )
    # The driver records only the rows-only check for this oracle-less
    # entry (rows > 0), so a verdict COLUMN cannot fail it — if the sink
    # ever drifted, every row would flip to false and the driver would
    # stay green (round-10 VERDICT "What's wrong" #1). Enforce instead of
    # report: any disagreeing day raises at execution (CaseWhen evaluates
    # branches lazily, so raise_error fires only on drift), turning the
    # driver's row into err. The column stays in the schema — all-true on
    # every surviving run — so the row count and shape are unchanged.
    return (
        prof.join(b, "d", "full")
        .select(
            "d",
            "dau",
            "wau",
            "stickiness",
            F.when(agrees, F.lit(True))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "engagement sink drifted from the batch-grain "
                            "answer on day "
                        ),
                        F.col("d").cast("string"),
                    )
                )
            )
            .alias("agrees_with_batch"),
        )
        .orderBy("d")
    )
