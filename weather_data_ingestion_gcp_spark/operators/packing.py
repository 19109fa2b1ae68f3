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


def chunk_spans(
    df: DataFrame,
    id_col: str,
    n_tokens: Column,
    chunk_len: int = 384,
    overlap: int = 64,
) -> DataFrame:
    """Fixed-size training chunks with overlap: one row per (doc, chunk)
    covering token span [tok_start, tok_end).

    Chunk i starts at ``i * stride`` (stride = chunk_len - overlap) and a
    document yields ``ceil((n - chunk_len) / stride) + 1`` chunks (min 1,
    so empty/short docs still produce their single partial chunk). This is
    the per-document half of context-window construction — unlike
    :func:`pack_offsets` it never needs a cross-document ordering, so it
    is embarrassingly parallel: a ``sequence`` + ``posexplode`` per row,
    no shuffle at all. Row growth is bounded by n_tokens/stride per doc
    (~3x rows at the default 384/64), far below the token-level explode a
    naive implementation would do.
    """
    stride = chunk_len - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_len")
    n = n_tokens.cast("long")
    n_chunks = F.when(n <= chunk_len, F.lit(1).cast("long")).otherwise(
        F.ceil((n - chunk_len) / F.lit(stride).cast("double")).cast("long") + 1
    )
    base = df.select(
        F.col(id_col), n.alias("n_tokens"), n_chunks.alias("_nc")
    )
    return base.select(
        id_col,
        "n_tokens",
        F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)),
    ).select(
        id_col,
        F.col("pos").cast("int").alias("chunk_idx"),
        (F.col("col") * stride).alias("tok_start"),
        F.least(F.col("col") * stride + chunk_len, F.col("n_tokens")).alias(
            "tok_end"
        ),
    )


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
