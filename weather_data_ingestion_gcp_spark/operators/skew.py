"""Skew-mitigation: salted join.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit,
planner-independent fallback for the pathological case — a single join key
holding a double-digit percentage of a 100 TB fact table — and for
aggregations, where AQE cannot split a single group.

``salted_join``: the fact side gets a deterministic per-row salt; the
dimension side is replicated once per salt value; the join key becomes
(key, salt), spreading one hot key over ``salts`` shuffle partitions.
Replication multiplies the dimension by ``salts`` — use only when the
dimension side is small enough for that (it usually is; a big-big skewed
join wants AQE or a skew-key split instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join fact<->dim on ``key`` with the hot-key pressure spread over
    ``salts`` partitions. Result is identical to ``fact.join(dim, key, how)``."""
    # deterministic salt from the full row (xxhash64 of all fact columns):
    # reproducible runs, and identical rows co-locate — harmless
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salts))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("long")
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
