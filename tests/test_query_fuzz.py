"""Differential query fuzzing: hypothesis-generated filter/group/agg
queries rendered from ONE AST into BOTH the Spark DataFrame API and
DuckDB SQL, results compared exactly.

This generalizes the repo's oracle methodology beyond the 223
hand-written pairs: instead of trusting that each translation is
faithful, the fuzzer samples the (predicate x grouping x aggregate)
space and checks engine agreement on every draw. The AST keeps every
expression in the exact-integer discipline (cents = ROUND(value*100)
as BIGINT, modular user buckets, date literals), so any mismatch is a
real semantics bug — never a float-accumulation artifact.

Shrinking matters here: a failing draw minimizes to the smallest
predicate/aggregate combination that disagrees."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from weather_data_ingestion_gcp_spark.plans.registry import load_table

SF = "/root/testdata/sf0.001"
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# --- the tiny query AST ----------------------------------------------------
# atom: ("cents_gt", c) | ("etype_eq", t) | ("user_mod", k, r) | ("day_ge", d)
# pred: (atoms, combiner "AND"/"OR", negate_flags)
# query: (pred | None, group_keys subset of ["event_type", "day"], aggs)

_ATOM = st.one_of(
    st.tuples(st.just("cents_gt"), st.integers(min_value=0, max_value=50_000)),
    st.tuples(st.just("etype_eq"), st.sampled_from(_EVENT_TYPES)),
    st.tuples(
        st.just("user_mod"),
        st.integers(min_value=2, max_value=7),
        st.integers(min_value=0, max_value=6),
    ),
    st.tuples(
        st.just("day_ge"),
        st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1)),
    ),
)

_PRED = st.tuples(
    st.lists(_ATOM, min_size=1, max_size=3),
    st.sampled_from(["AND", "OR"]),
    st.lists(st.booleans(), min_size=3, max_size=3),
)

_AGGS = st.lists(
    st.sampled_from(["n", "sum_cents", "min_cents", "max_cents", "nd_users"]),
    min_size=1,
    max_size=5,
    unique=True,
)

_QUERY = st.tuples(
    st.none() | _PRED,
    st.lists(st.sampled_from(["event_type", "day"]), max_size=2, unique=True),
    _AGGS,
)


def _atom_sql(a) -> str:
    if a[0] == "cents_gt":
        return f"(CAST(ROUND(value * 100, 0) AS BIGINT) > {a[1]})"
    if a[0] == "etype_eq":
        return f"(event_type = '{a[1]}')"
    if a[0] == "user_mod":
        return f"((user_id % {a[1]}) = {a[2]})"
    return f"(CAST(ts AS DATE) >= DATE '{a[1].isoformat()}')"


def _atom_spark(a):
    cents = F.round(F.col("value") * 100, 0).cast("long")
    if a[0] == "cents_gt":
        return cents > a[1]
    if a[0] == "etype_eq":
        return F.col("event_type") == a[1]
    if a[0] == "user_mod":
        return (F.col("user_id") % a[1]) == a[2]
    return F.to_date("ts") >= F.lit(a[1].isoformat()).cast("date")


_AGG_SQL = {
    "n": "CAST(COUNT(*) AS BIGINT) AS n",
    "sum_cents": "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)"
    " AS sum_cents",
    "min_cents": "CAST(MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)"
    " AS min_cents",
    "max_cents": "CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)"
    " AS max_cents",
    "nd_users": "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_users",
}


def _agg_spark(name):
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return {
        "n": F.count(F.lit(1)).cast("long").alias("n"),
        "sum_cents": F.sum(cents).cast("long").alias("sum_cents"),
        "min_cents": F.min(cents).cast("long").alias("min_cents"),
        "max_cents": F.max(cents).cast("long").alias("max_cents"),
        "nd_users": F.countDistinct("user_id").cast("long").alias("nd_users"),
    }[name]


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c, v in zip(cols, r):
            if isinstance(v, dt.datetime):
                v = v.date()
            if isinstance(v, dt.date):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    return con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=_QUERY)
def test_spark_and_duckdb_agree_on_generated_queries(spark, duck, q):
    pred, keys, aggs = q
    e = load_table(spark, SF, "events")
    sdf = e.select(
        "event_type", F.to_date("ts").alias("day"), "user_id", "value", "ts"
    )
    where_sql = ""
    if pred is not None:
        atoms, comb, negs = pred
        parts_sql, cond = [], None
        for i, a in enumerate(atoms):
            s, c = _atom_sql(a), _atom_spark(a)
            if negs[i % len(negs)]:
                s, c = f"(NOT {s})", ~c
            parts_sql.append(s)
            cond = c if cond is None else (cond & c if comb == "AND" else cond | c)
        where_sql = " WHERE " + f" {comb} ".join(parts_sql)
        sdf = sdf.filter(cond)

    agg_sql = ", ".join(_AGG_SQL[a] for a in aggs)
    if keys:
        exprs = ["CAST(ts AS DATE)" if k == "day" else k for k in keys]
        key_sql = ", ".join(
            f"{e} AS {k}" if k == "day" else k for e, k in zip(exprs, keys)
        )
        sql = (
            f"SELECT {key_sql}, {agg_sql} FROM events{where_sql} "
            f"GROUP BY {', '.join(exprs)}"
        )
        got = sdf.groupBy(*keys).agg(*[_agg_spark(a) for a in aggs])
    else:
        sql = f"SELECT {agg_sql} FROM events{where_sql}"
        got = sdf.agg(*[_agg_spark(a) for a in aggs])

    cols = keys + aggs
    spark_rows = _norm([tuple(r) for r in got.select(*cols).collect()], cols)
    duck_rows = _norm(duck.execute(sql).fetchall(), cols)
    assert spark_rows == duck_rows, f"\nSQL: {sql}\nspark={spark_rows[:5]}\nduck={duck_rows[:5]}"


# --- string-semantics fuzz over documents -----------------------------------
# The engine's text family leans on substring/lower/length/replace/strpos
# mirroring between Spark and DuckDB; fuzz that dialect surface too.

_DOC_ATOM = st.one_of(
    st.tuples(st.just("chars_gt"), st.integers(min_value=0, max_value=400)),
    st.tuples(st.just("lang_eq"), st.sampled_from(["en", "de", "fr", "es", "it"])),
    st.tuples(st.just("src_like"), st.integers(min_value=0, max_value=1)),
    st.tuples(st.just("contains"), st.sampled_from(list("aeiost"))),
)

_DOC_AGGS = st.lists(
    st.sampled_from(["n", "sum_len", "min_sub", "max_rep", "nd_lang"]),
    min_size=1,
    max_size=4,
    unique=True,
)

_DOC_QUERY = st.tuples(
    st.none() | st.tuples(_DOC_ATOM, _DOC_ATOM, st.sampled_from(["AND", "OR"])),
    st.lists(st.sampled_from(["lang", "source"]), max_size=2, unique=True),
    _DOC_AGGS,
    st.integers(min_value=1, max_value=5),   # substring start
    st.integers(min_value=1, max_value=12),  # substring length
)


def _doc_atom_sql(a) -> str:
    return {
        "chars_gt": lambda: f"(n_chars > {a[1]})",
        "lang_eq": lambda: f"(lang = '{a[1]}')",
        "src_like": lambda: f"(source LIKE 'src{a[1]}%')",
        "contains": lambda: f"(strpos(lower(text), '{a[1]}') > 0)",
    }[a[0]]()


def _doc_atom_spark(a):
    return {
        "chars_gt": lambda: F.col("n_chars") > a[1],
        "lang_eq": lambda: F.col("lang") == a[1],
        "src_like": lambda: F.col("source").like(f"src{a[1]}%"),
        "contains": lambda: F.instr(F.lower("text"), a[1]) > 0,
    }[a[0]]()


@pytest.fixture(scope="module")
def duck_docs():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=_DOC_QUERY)
def test_spark_and_duckdb_agree_on_string_queries(spark, duck_docs, q):
    pred, keys, aggs, sub_a, sub_b = q
    d = load_table(spark, SF, "documents")
    agg_sql = {
        "n": "CAST(COUNT(*) AS BIGINT) AS n",
        "sum_len": "CAST(SUM(length(text)) AS BIGINT) AS sum_len",
        "min_sub": f"MIN(substring(lower(text), {sub_a}, {sub_b})) AS min_sub",
        "max_rep": "MAX(replace(source, 'src', 'S')) AS max_rep",
        "nd_lang": "CAST(COUNT(DISTINCT lang) AS BIGINT) AS nd_lang",
    }
    agg_spark = {
        "n": F.count(F.lit(1)).cast("long").alias("n"),
        "sum_len": F.sum(F.length("text")).cast("long").alias("sum_len"),
        "min_sub": F.min(F.substring(F.lower("text"), sub_a, sub_b)).alias("min_sub"),
        "max_rep": F.max(F.replace(F.col("source"), F.lit("src"), F.lit("S"))).alias("max_rep"),
        "nd_lang": F.countDistinct("lang").cast("long").alias("nd_lang"),
    }
    sdf = d
    where_sql = ""
    if pred is not None:
        a1, a2, comb = pred
        where_sql = f" WHERE {_doc_atom_sql(a1)} {comb} {_doc_atom_sql(a2)}"
        c1, c2 = _doc_atom_spark(a1), _doc_atom_spark(a2)
        sdf = sdf.filter(c1 & c2 if comb == "AND" else c1 | c2)
    sel = ", ".join(agg_sql[a] for a in aggs)
    if keys:
        sql = (
            f"SELECT {', '.join(keys)}, {sel} FROM documents{where_sql} "
            f"GROUP BY {', '.join(keys)}"
        )
        got = sdf.groupBy(*keys).agg(*[agg_spark[a] for a in aggs])
    else:
        sql = f"SELECT {sel} FROM documents{where_sql}"
        got = sdf.agg(*[agg_spark[a] for a in aggs])
    cols = keys + aggs
    spark_rows = _norm([tuple(r) for r in got.select(*cols).collect()], cols)
    duck_rows = _norm(duck_docs.execute(sql).fetchall(), cols)
    assert spark_rows == duck_rows, f"\nSQL: {sql}"
