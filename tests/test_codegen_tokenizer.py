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


def test_bpe_pairs_codegen_equals_hof(spark):
    """Round-14: operators.bpe adjacent-pair extraction moved from the
    interpreted transform/element_at HOF to a lookahead-regex capture +
    substring_index split. The old HOF form is restated here as the
    reference over spelled-word edge cases: multi-char merged symbols,
    single-symbol words (empty pair set), adjacent repeats (overlap),
    and delimiter-sharing runs — per-row pair LISTS must match exactly,
    which is strictly stronger than the learner's aggregate equality."""
    from weather_data_ingestion_gcp_spark.operators import bpe

    seqs = [
        (" h e l l o ",),
        (" a ",),  # single symbol: no pairs
        (" l l l l ",),  # adjacent repeats: overlapping pairs
        (" th e q u ick ",),  # multi-char merged symbols
        (" ab ab ab ",),
        (" x y ",),
        (" lo w e r lo ",),
    ]
    df = spark.createDataFrame(seqs, "seq string")
    toks = F.split(F.trim(F.col("seq")), " ")
    old = (
        df.select(toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS l,"
                " element_at(toks, i + 1) AS r))"
            ).alias("ps")
        )
        .collect()
    )
    new = (
        df.select(
            F.regexp_extract_all(
                F.trim(F.col("seq")), F.lit(bpe._PAIRS_PATTERN), 1
            ).alias("caps")
        )
        .where(F.size("caps") >= 1)
        .select(
            F.transform(
                F.col("caps"),
                lambda p: F.struct(
                    F.substring_index(p, " ", 1).alias("l"),
                    F.substring_index(p, " ", -1).alias("r"),
                ),
            ).alias("ps")
        )
        .collect()
    )
    assert len(old) == len(new)
    for o, m in zip(old, new):
        assert [tuple(p) for p in o["ps"]] == [tuple(p) for p in m["ps"]]


def test_bpe_learn_merges_matches_reference(spark):
    """End-to-end differential pin for the learner over a vocabulary
    whose merge sequence exercises delimiter-sharing adjacent matches
    (the two-pass replace) and the (count DESC, l, r) tiebreak."""
    from weather_data_ingestion_gcp_spark.operators import bpe

    words = spark.createDataFrame(
        [("aaaa", 3), ("aabb", 2), ("abab", 2), ("bb", 5), ("a", 7)],
        "w string, n long",
    )
    got = [
        tuple(r)
        for r in bpe.bpe_learn_merges(words, "w", "n", n_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    # hand-derived: r1 counts aa=3*3(overlap)+2=11? no — overlapping
    # adjacent pairs: 'aaaa' has aa,aa,aa (3); 'aabb' aa,ab,bb; 'abab'
    # ab,ba,ab; 'bb' bb. aa: 3*3+2=11, ab: 2+2*2=6, bb: 2+5=7, ba: 2.
    # merge1 = aa(11). rewrite (two-pass, scan-left disjoint):
    # aaaa->'aa aa', aabb->'aa b b', abab unchanged ('a b a b').
    # r2: 'aa aa'(3): (aa,aa)=3; 'aa b b'(2): (aa,b)=2,(b,b)=2;
    # 'a b a b'(2): (a,b)=2,(b,a)=2,(a,b)->(a,b)=2 twice => 4;
    # 'b b'(5): (b,b)=5. counts: (b,b)=7, (a,b)=4, (aa,aa)=3, ...
    # merge2 = bb(7). etc — assert the engine agrees with itself run
    # twice (stability) and with the frozen expected prefix below.
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 11
    assert got[1][:3] == (2, "b", "b") and got[1][4] == 7
    again = [
        tuple(r)
        for r in bpe.bpe_learn_merges(words, "w", "n", n_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == again


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
