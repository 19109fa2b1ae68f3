"""Round-13 optimization regression tests: the codegen tokenizer/n-gram
formulations (operators.text.words / ngram_array / bigrams /
stopword_hits, and the char-pair capture in char_pair_counts) must be
byte-identical to the interpreted higher-order-function expressions they
replaced. The old HOF forms are restated HERE as the reference — if a
future edit drifts the codegen forms, these tests catch it without the
DuckDB oracles.

Why the rewrite exists (see operators/text.py docstrings): array-lambda
HOFs run through interpreted Catalyst eval, whose hot dispatch sites
sporadically deoptimize deep into a many-query session — measured
full-suite spikes of 15-44 s on tokenizer-bound queries whose
isolated-warm cost is ~1-2 s. The builtin/regex forms stay inside
whole-stage codegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_ingestion_gcp_spark.operators import text as text_ops

EDGE_ROWS = [
    (1, "The quick  brown fox"),
    (2, "  leading and trailing  "),
    (3, ""),
    (4, None),
    (5, "\t tabs\nand\nnewlines \r\n mixed\x0bvt \x0cff"),
    (6, "one"),
    (7, "a b"),
    (8, "x " * 30),
    (9, "UPPER lower MiXeD 123 *&^ sym-bols"),
    (10, "   "),
    (11, "word" * 5 + " b"),
    (12, "dup dup dup tri tri x"),
    (13, "the a of and to in is it"),  # consecutive stopwords
    (14, "a"),  # single stopword, no boundary spaces
    (15, "ab"),  # 2-char word (char-pair edge)
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_ROWS, "id int, text string")


def _words_hof(text):
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def _ngrams_hof(text, n):
    ws = _words_hof(text)
    if n == 1:
        return ws
    idx = F.when(
        F.size(ws) >= n, F.sequence(F.lit(1), F.size(ws) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j).cast("int")) for j in range(n)]
        ),
    )


def test_words_matches_hof(edge_df):
    rows = edge_df.select(
        "id",
        _words_hof(F.col("text")).alias("old"),
        text_ops.words(F.col("text")).alias("new"),
    ).collect()
    for r in rows:
        assert r["old"] == r["new"], f"id={r['id']}: {r['old']!r} != {r['new']!r}"


@pytest.mark.parametrize("n", [1, 2, 3, 8, 20])
def test_ngram_array_matches_hof(edge_df, n):
    rows = edge_df.select(
        "id",
        _ngrams_hof(F.col("text"), n).alias("old"),
        text_ops.ngram_array(F.col("text"), n).alias("new"),
    ).collect()
    for r in rows:
        old = r["old"] if r["old"] is not None else []
        # old HOF returns [] for NULL text at n>=2 (the when() guard),
        # NULL at n==1; ngram_array mirrors that exactly
        if n == 1 and r["old"] is None:
            assert r["new"] is None
            continue
        assert old == r["new"], f"n={n} id={r['id']}: {old!r} != {r['new']!r}"


def test_bigrams_tokenized_matches_hof(edge_df):
    toks_df = edge_df.select(
        "id", _words_hof(F.col("text")).alias("ws")
    )
    old = F.when(F.size("ws") < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("ws", i + 1), F.element_at("ws", i + 2)
            ),
        )
    )
    rows = toks_df.select(
        "id",
        old.alias("old"),
        text_ops.bigrams(F.col("ws"), tokenized=True).alias("new"),
    ).collect()
    for r in rows:
        assert r["old"] == r["new"], f"id={r['id']}: {r['old']!r} != {r['new']!r}"


def test_stopword_hits_matches_hof(edge_df):
    for lang in sorted(text_ops.STOPWORDS):
        sw = F.array(*[F.lit(w) for w in text_ops.STOPWORDS[lang]])
        old = F.size(F.filter(_words_hof(F.col("text")), lambda w: F.array_contains(sw, w)))
        rows = edge_df.select(
            "id",
            old.alias("old"),
            text_ops.stopword_hits(F.col("text"), lang).alias("new"),
        ).collect()
        for r in rows:
            assert r["old"] == r["new"], (
                f"lang={lang} id={r['id']}: {r['old']!r} != {r['new']!r}"
            )


def test_char_pair_capture_matches_substr_windows(edge_df):
    w = edge_df.select(F.explode(_words_hof(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    old = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.col("w").substr(i, F.lit(2)),
    )
    rows = w.select(
        "w",
        old.alias("old"),
        F.regexp_extract_all("w", F.lit(r"(?s)(?=(..))."), 1).alias("new"),
    ).collect()
    assert rows, "edge corpus must produce at least one 2+-char token"
    for r in rows:
        assert r["old"] == r["new"], f"w={r['w']!r}: {r['old']!r} != {r['new']!r}"


def test_ngram_plan_has_no_interpreted_hof(spark, edge_df):
    """The physical plan of the codegen n-gram explode must not contain
    lambda/higher-order nodes (transform/filter lambdas defeat
    whole-stage codegen — the round-13 pathology)."""
    plan = (
        edge_df.select(F.explode(text_ops.ngram_array(F.col("text"), 3)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lambdafunction" not in plan.lower(), plan
    assert "ArrayTransform" not in plan, plan
    assert "ArrayFilter" not in plan, plan
