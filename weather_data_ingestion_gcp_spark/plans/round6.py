"""Round-6 additions: the scale path for accuracy contracts.

The round-6 empirical 10x probe (tools/scale_probe.py, BASELINE.md)
measured the full-corpus `lsh_recall_contract` ground truth blowing past
80 GB of shuffle spill at sf1: the probe corpus keeps the generator's
fixed 31-word vocabulary, so every 3-gram shingle's document frequency
grows linearly with the corpus and PPJoin's prefix-filter candidates
grow QUADRATICALLY (sum over tokens of df² — prefix filtering is only
sub-quadratic when the token-frequency tail grows with the corpus).

The measured lesson: an accuracy CONTRACT does not need the full corpus
— recall is a statistical property, and an unbiased estimate over a
deterministic hash-sample of documents is the shape a 100 TB pipeline
actually runs (both the LSH under test and the exact ground truth
restricted to the same sampled sub-corpus; pair candidates shrink by
the sample rate SQUARED, 25x here). The full-corpus contract entry
stays registered (exact at driver SFs, driver-green r05); this is the
companion that survives the 10x probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, sampling
from .registry import _sql_hex4_to_int, load_table, register
from .round3b import _lsh_recall_oracle, ppjoin_pairs_frame

#: deterministic sample rate (percent of md5-hex4 doc_id buckets)
_SAMPLE_PCT = 20


def _sampled_recall_oracle() -> str:
    import re

    base = _lsh_recall_oracle().strip()
    assert base.startswith("WITH ")
    # rewrite every `documents` reference inside the composed exact/LSH
    # oracles to the sampled CTE (DuckDB rejects a same-named shadowing
    # CTE as a circular reference; the composed oracles touch no other
    # table, so a word-boundary rewrite is exact)
    body = re.sub(r"\bdocuments\b", "docs_sampled", base[len("WITH "):])
    return (
        "WITH docs_sampled AS (SELECT * FROM documents "
        f"WHERE {_sql_hex4_to_int('doc_id')} % 100 < {_SAMPLE_PCT}),\n"
        + body
    )


@register("lsh_recall_contract_sampled", oracle=_sampled_recall_oracle())
def lsh_recall_contract_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH recall measured on a deterministic 20% hash-sample of
    the corpus — the 100 TB form of `lsh_recall_contract` (round3b).

    Same LSH parameters, same provably-complete PPJoin ground truth
    (shared `ppjoin_pairs_frame` pipeline, so the two contracts cannot
    drift), but both sides see only the sampled sub-corpus: candidate
    pairs scale with the sample rate squared, which is what kept the
    10x probe inside memory where the full-corpus contract spilled out
    of disk. Recall over a uniform doc-sample is an unbiased estimate of
    pair recall for the banding curve (pair inclusion is determined by
    the two docs' signatures alone, independent of the rest of the
    corpus), so the pinned >= 90% bound carries the same meaning."""
    d = load_table(spark, sf_dir, "documents").filter(
        sampling.hash_bucket(F.col("doc_id")) < _SAMPLE_PCT
    )
    lsh = dedup.cache_pairs_frame(
        dedup.minhash_near_duplicates(
            d, "doc_id", "text", num_hashes=8, rows_per_band=2, shingle_n=3,
            threshold=0.5,
        ).select("id_a", "id_b")
    )
    exact = ppjoin_pairs_frame(d).select("id_a", "id_b")
    hit = exact.join(lsh, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_true"))
    denom = F.nullif(F.col("n_true"), F.lit(0))
    return hit.crossJoin(tot).select(
        F.col("n_true").cast("long").alias("n_true_pairs"),
        F.col("n_hit").cast("long").alias("n_lsh_found"),
        F.floor(F.col("n_hit") * F.lit(1000000.0) / denom)
        .cast("long")
        .alias("recall_ppm"),
        (F.col("n_hit") * F.lit(1000000.0) / denom >= 900000).alias("recall_ok"),
    )
