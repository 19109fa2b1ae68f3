"""Fellegi-Sunter record linkage against a pure-Python reference —
a third opinion beside the DuckDB oracle (the oracle mirrors the SQL
formulation; this mirrors the 1969 DEFINITION: per-field log likelihood
ratios with data-estimated u probabilities)."""

from __future__ import annotations

import math

from weather_data_ingestion_gcp_spark.plans import QUERIES

_W = 4
_SORT_PREFIX = 40


def _write_documents(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{path}/documents.parquet")


def _nano_ln(x: int) -> int:
    return round(math.log(x) * 1_000_000_000)


def _py_fs(rows: list[tuple]) -> dict[tuple, tuple]:
    n = len(rows)
    attr = {
        i: (t.lower()[:8], len(t) // 8, src) for i, t, _lang, src in rows
    }

    def u_ppm(field: int) -> int:
        counts: dict = {}
        for v in attr.values():
            counts[v[field]] = counts.get(v[field], 0) + 1
        tot = sum(c * ((1_000_000 * c) // n) for c in counts.values())
        return max(min(tot // n, 999_999), 1)

    def weights(u: int, m: tuple) -> tuple[int, int]:
        num, den = m
        ln_u = _nano_ln(u) - _nano_ln(1_000_000)
        ln_1mu = _nano_ln(1_000_000 - u) - _nano_ln(1_000_000)
        agree = _nano_ln(num) - _nano_ln(den) - ln_u
        disagree = _nano_ln(den - num) - _nano_ln(den) - ln_1mu
        return agree, disagree

    w = [
        weights(u_ppm(0), (19, 20)),
        weights(u_ppm(1), (9, 10)),
        weights(u_ppm(2), (7, 10)),
    ]

    # sorted-neighborhood candidates: per-lang sort by prefix40, W successors
    by_lang: dict[str, list[tuple]] = {}
    for i, t, lang, _src in rows:
        by_lang.setdefault(lang, []).append((t.lower()[:_SORT_PREFIX], i))
    out: dict[tuple, tuple] = {}
    for docs in by_lang.values():
        docs.sort()
        for a in range(len(docs)):
            for b in range(a + 1, min(a + 1 + _W, len(docs))):
                ia, ib = sorted((docs[a][1], docs[b][1]))
                agrees = tuple(
                    attr[ia][f] == attr[ib][f] for f in range(3)
                )
                score = sum(
                    w[f][0] if agrees[f] else w[f][1] for f in range(3)
                )
                if score >= 0:
                    out[(ia, ib)] = (*agrees, score, score >= 10**9)
    return out


def test_fellegi_sunter_matches_pure_python(spark, tmp_path):
    rows = [
        # same prefix8 + same length bucket, different sources: the
        # cross-source link the method should up-weight
        (0, "alpha beta gamma delta epsilon zeta", "en", "web"),
        (1, "alpha bet gamma delta epsilon etaa", "en", "books"),
        # same prefix8 + same source
        (2, "bravo charlie delta echo foxtrot", "en", "web"),
        (3, "bravo chump delta echo golfcourse", "en", "web"),
        # adjacent in sort order but nothing agrees: negative evidence,
        # filtered out unless length buckets happen to collide
        (4, "charlie delta echo foxtrot golf hotel india", "en", "wiki"),
        (5, "delta echo foxtrot golf hotel", "en", "web"),
        (6, "echo foxtrot golf hotel india juliet kilo", "en", "news"),
        (7, "zulu yankee xray whiskey victor", "en", "web"),
        # other-lang twin of doc 0: never a candidate across langs
        (8, "alpha beta gamma delta epsilon zeta", "de", "web"),
        (9, "alpha beta gamma delta epsilon et", "de", "web"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        (r["id_a"], r["id_b"]): (
            r["agree_prefix"],
            r["agree_len"],
            r["agree_src"],
            r["score_nano"],
            r["is_link"],
        )
        for r in QUERIES["record_linkage_fellegi_sunter"](
            spark, str(tmp_path)
        ).collect()
    }
    want = _py_fs(rows)
    assert got == want
    # the headline decisions: both shared-prefix pairs are links
    assert got[(0, 1)][4] and got[(2, 3)][4]
    # the cross-source pair survives despite the source disagreement
    assert got[(0, 1)][0] and not got[(0, 1)][2]
    # no cross-lang pair ever scored
    assert not any(k[0] >= 8 or k[1] >= 8 for k in got if k != (8, 9))


def test_fellegi_sunter_weight_arithmetic_is_exact(spark, tmp_path):
    """The score is a BIGINT sum of nano-quantized ln terms — recompute
    one pair's score from the corpus statistics by hand."""
    rows = [
        (0, "aaaa bbbb cccc", "en", "web"),
        (1, "aaaa bbbb cccd", "en", "web"),
        (2, "totally different text here", "en", "wiki"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    out = {
        (r["id_a"], r["id_b"]): r["score_nano"]
        for r in QUERIES["record_linkage_fellegi_sunter"](
            spark, str(tmp_path)
        ).collect()
    }
    n = 3
    # fields of docs 0/1: prefix 'aaaa bbb' agrees, length bucket
    # 14//8 = 1 agrees (doc 2 is 27//8 = 3), source agrees — every field
    # has counts {2, 1}, so
    #   u_ppm = (2*(2000000//3) + 1*(1000000//3)) // 3
    #         = (2*666666 + 333333) // 3 = 1666665 // 3 = 555555
    u = (2 * ((1_000_000 * 2) // n) + 1 * ((1_000_000 * 1) // n)) // n
    assert u == 555_555

    def wts(u_ppm, num, den):
        agree = (
            _nano_ln(num)
            - _nano_ln(den)
            - (_nano_ln(u_ppm) - _nano_ln(1_000_000))
        )
        dis = (
            _nano_ln(den - num)
            - _nano_ln(den)
            - (_nano_ln(1_000_000 - u_ppm) - _nano_ln(1_000_000))
        )
        return agree, dis

    expected = wts(u, 19, 20)[0] + wts(u, 9, 10)[0] + wts(u, 7, 10)[0]
    assert out[(0, 1)] == expected


def _py_good_turing(rows: list[tuple]) -> dict[str, tuple]:
    from collections import Counter

    per_src: dict[str, Counter] = {}
    for _i, t, _lang, src in rows:
        per_src.setdefault(src, Counter()).update(
            w for w in t.lower().split() if w
        )
    out = {}
    for src, wc in per_src.items():
        n = sum(wc.values())
        v = len(wc)
        n1 = sum(1 for c in wc.values() if c == 1)
        n2 = sum(1 for c in wc.values() if c == 2)
        chao = 100 * v + (100 * n1 * n1) // (2 * n2) if n2 > 0 else None
        out[src] = (n, v, n1, n2, (1_000_000 * n1) // n, chao)
    return out


def test_good_turing_matches_pure_python(spark, tmp_path):
    rows = [
        # web: 'a' x3, 'b' x2, c/d singletons -> N=7 V=4 N1=2 N2=1
        (0, "a b c a", "en", "web"),
        (1, "a b d", "en", "web"),
        # wiki: all singletons -> N1=V, no doubleton -> chao1 NULL
        (2, "p q r s", "en", "wiki"),
        # books: saturated (no singletons) -> unseen_ppm = 0
        (3, "x y x y", "de", "books"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        r["source"]: (
            r["n_tokens"],
            r["vocab"],
            r["n1"],
            r["n2"],
            r["unseen_ppm"],
            r["chao1_x100"],
        )
        for r in QUERIES["good_turing_vocab_coverage"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == _py_good_turing(rows)
    assert got["web"] == (7, 4, 2, 1, (1_000_000 * 2) // 7, 400 + 200)
    assert got["wiki"][5] is None  # no doubletons: Chao1 undefined
    assert got["books"][4] == 0  # saturated vocabulary: zero unseen mass


def test_chi_square_matches_pure_python(spark, tmp_path):
    # 2x2 grid with one EMPTY cell (de, wiki): the densified grid must
    # still emit it with contribution = expected
    rows = [
        (0, "t0", "en", "web"),
        (1, "t1", "en", "web"),
        (2, "t2", "en", "web"),
        (3, "t3", "en", "wiki"),
        (4, "t4", "de", "web"),
        (5, "t5", "de", "web"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        (r["lang"], r["source"]): (
            r["observed"],
            r["expected_ppm"],
            r["contrib_nano"],
        )
        for r in QUERIES["contingency_chi_square"](
            spark, str(tmp_path)
        ).collect()
    }

    from collections import Counter

    o = Counter((lang, src) for _i, _t, lang, src in rows)
    langs = sorted({lang for _i, _t, lang, _s in rows})
    srcs = sorted({src for _i, _t, _l, src in rows})
    n = len(rows)
    want = {}
    for lang in langs:
        for src in srcs:
            obs = o.get((lang, src), 0)
            r_tot = sum(o.get((lang, s), 0) for s in srcs)
            c_tot = sum(o.get((la, src), 0) for la in langs)
            e = float(r_tot) * float(c_tot) / float(n)
            want[(lang, src)] = (
                obs,
                round(e * 1_000_000),
                round(1_000_000_000 * ((obs - e) * (obs - e)) / e),
            )
    assert got == want
    # the empty cell is present and contributes exactly E
    assert got[("de", "wiki")][0] == 0
    assert got[("de", "wiki")][2] == round(1e9 * (2 * 1 / 6))
    # chi-square total for a 2x2 table equals the textbook formula
    # X^2 = n (ad - bc)^2 / (r1 r2 c1 c2) with a,b,c,d = 3,1,2,0
    total = sum(v[2] for v in got.values()) / 1e9
    expect = 6 * (3 * 0 - 1 * 2) ** 2 / (4 * 2 * 5 * 1)
    assert abs(total - expect) < 1e-6
