"""Round-6d: nonparametric distribution-drift tests and the third
privacy audit.

The DQ family so far tests MOMENTS (z-score anomaly, Pearson/chi-square,
OLS) — all parametric. This module adds the rank/ECDF family, the
standard drift detectors for a training-data pipeline where value
distributions are anything but normal:

- Kolmogorov-Smirnov two-sample D per source (one-vs-rest ECDF max gap)
- Mann-Whitney U / AUC per source (rank-sum with exact tie handling)
- Benford first-digit audit of the money column (fraud/synthetic-data
  signal; expected frequencies from the integer-quantized ln discipline)
- t-closeness (Li et al. 2007): EMD between each QI group's ordered
  sensitive-attribute distribution and the global one — completing the
  k-anonymity / l-diversity / t-closeness privacy trio.

Everything is exact integer arithmetic: ECDF comparisons cross-multiply
counts instead of dividing (|cum_a * n_b - cum_b * n_a|), ranks use the
2x-scaled average-rank trick so ties stay integral, and the only ln()
calls take integer arguments nano-quantized before any further
arithmetic (the round6c discipline). Results are ppm integers — hash-
identical across engines by construction.

Scale shapes: every entry is counts-first — the raw table collapses to
a per-(group, value) hash aggregate before any window; the window/grid
relations are bounded (|sources| x |distinct lengths|, |QI| x |magnitude
buckets|, 9 digits), never O(rows). int64 bounds are documented per
entry; all hold beyond the 100x probe point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load_table, register
from .round6c import _nano_ln

#: KS decision threshold: D >= 0.05 (50000 ppm) flags drift
_KS_PPM = 50_000
#: AUC effect threshold: |AUC - 0.5| >= 0.1 flags a location shift
_AUC_PPM = 100_000
#: t-closeness threshold: EMD >= 0.2 (200000 ppm) is a violation
_T_PPM = 200_000


def _len_counts(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(per-(source, n_chars) counts, per-n_chars global counts) — the
    shared counts-first reduction both rank tests start from. The raw
    table never reaches a window: everything downstream operates on
    these two bounded relations (|sources| x |distinct lengths| and
    |distinct lengths|)."""
    counts = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lens = d.groupBy("n_chars").agg(F.count(F.lit(1)).cast("long").alias("c_all"))
    return counts, lens


_KS_ORACLE = """
    WITH counts AS (
        SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ),
    lens AS (
        SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c_all
        FROM documents GROUP BY n_chars
    ),
    lens_cum AS (
        SELECT n_chars,
               CAST(SUM(c_all) OVER (ORDER BY n_chars) AS BIGINT) AS cum_all,
               CAST(SUM(c_all) OVER () AS BIGINT) AS n
        FROM lens
    ),
    srcs AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY source
    ),
    cells AS (
        SELECT s.source, l.n_chars, s.n_s, COALESCE(c.c, 0) AS c
        FROM srcs s
        CROSS JOIN (SELECT n_chars FROM lens) l
        LEFT JOIN counts c ON c.source = s.source AND c.n_chars = l.n_chars
    ),
    cum AS (
        SELECT source, n_chars, n_s,
               CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars)
                    AS BIGINT) AS cum_s
        FROM cells
    ),
    gaps AS (
        SELECT cum.source, cum.n_s, lc.n,
               ABS(cum_s * (lc.n - cum.n_s)
                   - (lc.cum_all - cum_s) * cum.n_s) AS gap
        FROM cum JOIN lens_cum lc ON lc.n_chars = cum.n_chars
    ),
    agg AS (
        SELECT source, n_s,
               (1000000 * MAX(gap)) // NULLIF(n_s * (n - n_s), 0) AS d_ppm
        FROM gaps GROUP BY source, n_s, n
    )
    SELECT source, n_s AS n_docs, CAST(d_ppm AS BIGINT) AS d_ppm,
           d_ppm >= 50000 AS drifted
    FROM agg ORDER BY source
"""


@register("ks_length_drift_by_source", oracle=_KS_ORACLE)
def ks_length_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest Kolmogorov-Smirnov D over the n_chars distribution:
    for each source, the max ECDF gap between its documents and the rest
    of the corpus, as an exact ppm integer (the gap cross-multiplies
    counts — |cum_s * n_rest - cum_rest * n_s| — so no division happens
    until the single final floor-div). D >= 0.05 flags drift.

    Scale: the grid is |sources| x |distinct lengths| (bounded-domain
    attribute, sub-linear in rows); the raw table is reduced by one hash
    aggregate before any window touches it. int64 bound: 1e6 * max-gap
    needs n_s * n_rest < 9.2e12, i.e. corpora under ~6M docs per drift
    check; past that, floor-divide the gap by n_s * n_rest per length
    BEFORE the max (same winner, ppm-quantized comparison)."""
    d = load_table(spark, sf_dir, "documents")
    counts, lens = _len_counts(d)
    lens_cum = lens.select(
        "n_chars",
        F.sum("c_all")
        .over(Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_all"),
        F.sum("c_all").over(Window.partitionBy()).cast("long").alias("n"),
    )
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    cells = (
        srcs.crossJoin(F.broadcast(lens.select("n_chars")))
        .join(counts, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "n_s",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    cum = cells.select(
        "source",
        "n_chars",
        "n_s",
        F.sum("c")
        .over(
            Window.partitionBy("source")
            .orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("cum_s"),
    )
    gaps = cum.join(F.broadcast(lens_cum), "n_chars").select(
        "source",
        "n_s",
        "n",
        F.abs(
            F.col("cum_s") * (F.col("n") - F.col("n_s"))
            - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
        ).alias("gap"),
    )
    agg = gaps.groupBy("source", "n_s", "n").agg(
        F.expr(
            "(1000000 * MAX(gap)) div nullif(n_s * (n - n_s), 0)"
        ).alias("d_ppm")
    )
    return agg.select(
        "source",
        F.col("n_s").alias("n_docs"),
        F.col("d_ppm").cast("long").alias("d_ppm"),
        (F.col("d_ppm") >= _KS_PPM).alias("drifted"),
    ).orderBy("source")


_MW_ORACLE = """
    WITH counts AS (
        SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ),
    lens AS (
        SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c_all
        FROM documents GROUP BY n_chars
    ),
    rk AS (
        SELECT n_chars,
               CAST(COALESCE(SUM(c_all) OVER (
                   ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS before_all,
               c_all,
               CAST(SUM(c_all) OVER () AS BIGINT) AS n
        FROM lens
    ),
    scored AS (
        SELECT c.source, c.c,
               2 * rk.before_all + rk.c_all + 1 AS rank2, rk.n
        FROM counts c JOIN rk ON rk.n_chars = c.n_chars
    ),
    agg AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(SUM(c * rank2) AS BIGINT) AS r1_x2, MAX(n) AS n
        FROM scored GROUP BY source
    ),
    fin AS (
        SELECT source, n_docs,
               r1_x2 - n_docs * (n_docs + 1) AS u_x2,
               (1000000 * (r1_x2 - n_docs * (n_docs + 1)))
                 // NULLIF(2 * n_docs * (n - n_docs), 0) AS auc_ppm
        FROM agg
    )
    SELECT source, n_docs, CAST(u_x2 AS BIGINT) AS u_x2,
           CAST(auc_ppm AS BIGINT) AS auc_ppm,
           ABS(auc_ppm - 500000) >= 100000 AS shifted
    FROM fin ORDER BY source
"""


@register("mann_whitney_auc_by_source", oracle=_MW_ORACLE)
def mann_whitney_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest Mann-Whitney U over n_chars per source, with exact
    tie handling via 2x-scaled average ranks (a tie block spanning ranks
    [a+1, a+c] has 2*avg_rank = 2a + c + 1 — integral always). Reports
    2*U and the common-language effect size AUC = U / (n1*n2) in ppm;
    |AUC - 0.5| >= 0.1 flags a stochastic location shift.

    Scale: ranks are computed ONCE on the |distinct lengths| relation
    (bounded), then every source aggregates its own counts against them
    — no per-source sort, no densified grid at all (absent cells
    contribute zero to the rank-sum). int64 bound: 1e6 * 2U needs
    n_s * n_rest < 4.6e12 (~4M docs); past that report auc_x1000."""
    d = load_table(spark, sf_dir, "documents")
    counts, lens = _len_counts(d)
    rk = lens.select(
        "n_chars",
        F.coalesce(
            F.sum("c_all").over(
                Window.orderBy("n_chars").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("before_all"),
        "c_all",
        F.sum("c_all").over(Window.partitionBy()).cast("long").alias("n"),
    )
    scored = counts.join(F.broadcast(rk), "n_chars").select(
        "source",
        "c",
        (2 * F.col("before_all") + F.col("c_all") + 1).alias("rank2"),
        "n",
    )
    agg = scored.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("c") * F.col("rank2")).cast("long").alias("r1_x2"),
        F.max("n").alias("n"),
    )
    u_x2 = F.col("r1_x2") - F.col("n_docs") * (F.col("n_docs") + 1)
    fin = agg.select(
        "source",
        "n_docs",
        u_x2.alias("u_x2"),
        F.expr(
            "(1000000 * (r1_x2 - n_docs * (n_docs + 1)))"
            " div nullif(2 * n_docs * (n - n_docs), 0)"
        ).alias("auc_ppm"),
    )
    return fin.select(
        "source",
        "n_docs",
        F.col("u_x2").cast("long").alias("u_x2"),
        F.col("auc_ppm").cast("long").alias("auc_ppm"),
        (F.abs(F.col("auc_ppm") - 500_000) >= _AUC_PPM).alias("shifted"),
    ).orderBy("source")


_BENFORD_ORACLE = """
    WITH pos AS (
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events
        WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0
    ),
    obs AS (
        SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                 AS digit,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM pos GROUP BY 1
    ),
    digits AS (
        SELECT CAST(d AS BIGINT) AS digit
        FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS t(d)
    ),
    cells AS (
        SELECT dg.digit, COALESCE(o.observed, 0) AS observed
        FROM digits dg LEFT JOIN obs o ON o.digit = dg.digit
    ),
    tot AS (
        SELECT digit, observed,
               CAST(SUM(observed) OVER () AS BIGINT) AS total,
               ((CAST(ROUND(ln(digit + 1) * 1e9, 0) AS BIGINT)
                 - CAST(ROUND(ln(digit) * 1e9, 0) AS BIGINT)) * 1000000)
                 // CAST(ROUND(ln(10) * 1e9, 0) AS BIGINT) AS expected_ppm
        FROM cells
    )
    SELECT digit, observed,
           CAST((1000000 * observed) // NULLIF(total, 0) AS BIGINT)
             AS observed_ppm,
           CAST(expected_ppm AS BIGINT) AS expected_ppm,
           CAST((1000000 * observed) // NULLIF(total, 0) - expected_ppm
                AS BIGINT) AS excess_ppm
    FROM tot ORDER BY digit
"""


@register("benford_digit_audit", oracle=_BENFORD_ORACLE)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of the money column vs
    Benford's law — the classic synthetic-data / fraud screen. Expected
    frequencies log10(1 + 1/d) come from the nano-quantized integer-ln
    discipline ((ln(d+1) - ln(d)) * 1e6 div ln(10), every ln on an
    integer literal), so expected_ppm is the identical BIGINT in both
    engines. The digit is string-extracted from exact integer cents —
    no float log10/pow in the per-row path. Densified over all 9 digits
    (an absent digit is itself the finding).

    Scale: one hash aggregate to 9 rows; everything after is constant-
    size. The per-row path is substring(cast) — codegen'd, no UDF."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pos = e.select(cents.alias("cents")).filter(F.col("cents") > 0)
    obs = pos.groupBy(
        F.substring(F.col("cents").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    cells = (
        digits.join(F.broadcast(obs), "digit", "left")
        .select(
            "digit", F.coalesce("observed", F.lit(0)).cast("long").alias("observed")
        )
    )
    expected = F.expr(
        "((cast(round(ln(digit + 1) * 1e9, 0) as bigint)"
        "  - cast(round(ln(digit) * 1e9, 0) as bigint)) * 1000000)"
        " div cast(round(ln(10) * 1e9, 0) as bigint)"
    )
    tot = cells.select(
        "digit",
        "observed",
        F.sum("observed").over(Window.partitionBy()).cast("long").alias("total"),
        expected.alias("expected_ppm"),
    )
    return tot.select(
        "digit",
        "observed",
        F.expr("(1000000 * observed) div nullif(total, 0)").alias("observed_ppm"),
        F.col("expected_ppm").cast("long").alias("expected_ppm"),
        (
            F.expr("(1000000 * observed) div nullif(total, 0)")
            - F.col("expected_ppm")
        ).alias("excess_ppm"),
    ).orderBy("digit")


_TCLOSE_ORACLE = """
    WITH r AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(length(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                                AS VARCHAR)) AS BIGINT) AS bucket
        FROM events
    ),
    gdist AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS q FROM r GROUP BY bucket
    ),
    gcum AS (
        SELECT bucket,
               CAST(SUM(q) OVER (ORDER BY bucket) AS BIGINT) AS cum_q,
               CAST(SUM(q) OVER () AS BIGINT) AS n,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM gdist
    ),
    grp AS (
        SELECT event_type, day, bucket, CAST(COUNT(*) AS BIGINT) AS p
        FROM r GROUP BY event_type, day, bucket
    ),
    qi AS (
        SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_g
        FROM r GROUP BY event_type, day
    ),
    cells AS (
        SELECT qi.event_type, qi.day, qi.n_g, g.bucket,
               COALESCE(grp.p, 0) AS p
        FROM qi CROSS JOIN (SELECT bucket FROM gdist) g
        LEFT JOIN grp ON grp.event_type = qi.event_type
                     AND grp.day = qi.day AND grp.bucket = g.bucket
    ),
    cum AS (
        SELECT event_type, day, n_g, bucket,
               CAST(SUM(p) OVER (PARTITION BY event_type, day
                                 ORDER BY bucket) AS BIGINT) AS cum_p
        FROM cells
    ),
    gaps AS (
        SELECT c.event_type, c.day, c.n_g, gc.n, gc.m,
               ABS(c.cum_p * gc.n - gc.cum_q * c.n_g) AS gap
        FROM cum c JOIN gcum gc ON gc.bucket = c.bucket
    ),
    agg AS (
        SELECT event_type, day, n_g,
               (1000000 * CAST(SUM(gap) AS BIGINT))
                 // NULLIF((m - 1) * n_g * n, 0) AS emd_ppm
        FROM gaps GROUP BY event_type, day, n_g, n, m
    )
    SELECT event_type, day, n_g AS n, CAST(emd_ppm AS BIGINT) AS emd_ppm,
           emd_ppm >= 200000 AS t_violation
    FROM agg ORDER BY event_type, day
"""


@register("t_closeness_audit", oracle=_TCLOSE_ORACLE)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian 2007) over the ordered
    sensitive attribute "money magnitude" (decimal digit count of exact
    integer cents — an ordered, bounded bucketing with no libm): for
    each QI group (event_type, day), the Earth Mover's Distance between
    the group's bucket distribution and the global one,
    EMD = sum_i |cumP_i - cumQ_i| / (m - 1), as an exact ppm integer via
    count cross-multiplication. EMD >= 0.2 violates t-closeness — the
    group's value profile leaks through the quasi-identifiers.
    Completes the privacy trio with k-anonymity and l-diversity.

    Scale: counts-first (two hash aggregates), then a bounded
    |QI groups| x |buckets| grid (buckets <= digits of max cents, ~6).
    int64 bound: 1e6 * (m-1) * n_g * N < 9.2e18 holds to ~1e7-row
    corpora with 1e5-row groups; past that, per-bucket ppm floor-div
    before the sum (deterministic, epsilon-coarser EMD)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    r = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.length(cents.cast("string")).cast("long").alias("bucket"),
    )
    glob = r.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("q"))
    gcum = glob.select(
        "bucket",
        F.sum("q")
        .over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_q"),
        F.sum("q").over(Window.partitionBy()).cast("long").alias("n"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    grp = r.groupBy("event_type", "day", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("p")
    )
    qi = r.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_g")
    )
    cells = (
        qi.crossJoin(F.broadcast(glob.select("bucket")))
        .join(grp, ["event_type", "day", "bucket"], "left")
        .select(
            "event_type",
            "day",
            "n_g",
            "bucket",
            F.coalesce("p", F.lit(0)).cast("long").alias("p"),
        )
    )
    cum = cells.select(
        "event_type",
        "day",
        "n_g",
        "bucket",
        F.sum("p")
        .over(
            Window.partitionBy("event_type", "day")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("cum_p"),
    )
    gaps = cum.join(F.broadcast(gcum), "bucket").select(
        "event_type",
        "day",
        "n_g",
        "n",
        "m",
        F.abs(F.col("cum_p") * F.col("n") - F.col("cum_q") * F.col("n_g")).alias(
            "gap"
        ),
    )
    agg = gaps.groupBy("event_type", "day", "n_g", "n", "m").agg(
        F.expr(
            "(1000000 * cast(sum(gap) as bigint))"
            " div nullif((m - 1) * n_g * n, 0)"
        ).alias("emd_ppm")
    )
    return agg.select(
        "event_type",
        "day",
        F.col("n_g").alias("n"),
        F.col("emd_ppm").cast("long").alias("emd_ppm"),
        (F.col("emd_ppm") >= _T_PPM).alias("t_violation"),
    ).orderBy("event_type", "day")
