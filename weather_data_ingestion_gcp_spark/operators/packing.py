"""Sequence packing: assign documents to fixed-size training context
windows (GPT-style "concatenate the corpus, cut every ctx_len tokens").

The packing layout for a document is a pure function of the running token
offset, so the whole operator is one window cumulative sum — no Python, no
iteration. Packing runs PER SHARD (``part_col``): a global ordering would
funnel 100 TB through a single-partition window, while per-shard packing
keeps every partition independent (each shard produces its own chunk
stream, exactly how a multi-file tokenized dataset is laid out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    part_col: str,
    ctx_len: int = 512,
) -> DataFrame:
    """Per-document packing offsets: running start/end token offsets within
    the shard and the first/last context-window index the document lands
    in. ``floor`` semantics via integer ``div`` on BIGINT (offsets are
    non-negative). Documents spanning a cut get ``n_chunks > 1`` — the
    split-document accounting a packing-aware loss mask needs."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(n_tokens.cast("long")).over(w)
    return (
        df.select(
            F.col(part_col),
            F.col(id_col),
            n_tokens.cast("long").alias("n_tokens"),
            end.alias("end_offset"),
        )
        .withColumn("start_offset", F.col("end_offset") - F.col("n_tokens"))
        .withColumn("first_chunk", F.expr(f"start_offset div {ctx_len}"))
        .withColumn("last_chunk", F.expr(f"(end_offset - 1) div {ctx_len}"))
        .withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + 1)
    )
