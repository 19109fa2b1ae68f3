"""Round-6b entries against independent pure-Python references —
a third opinion beside the DuckDB oracle (the oracle mirrors the SQL
formulation; these mirror the DEFINITION)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from weather_data_ingestion_gcp_spark.plans import QUERIES

_SNM_W = 4
_SNM_PREFIX = 40


def _write_documents(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{path}/documents.parquet")


def _write_events(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(f"{path}/events.parquet")


def _py_snm(rows: list[tuple]) -> dict[tuple, float]:
    """Sorted-neighborhood near-dup pairs, straight from the definition."""
    by_lang: dict[str, list[tuple]] = {}
    for i, t, lang, _src in rows:
        by_lang.setdefault(lang, []).append((t[:_SNM_PREFIX].lower(), i, t))

    def bigrams(t: str) -> set:
        ws = [w for w in t.lower().split() if w]
        return {" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)}

    out: dict[tuple, float] = {}
    for docs in by_lang.values():
        docs.sort()
        for a in range(len(docs)):
            for b in range(a + 1, min(a + 1 + _SNM_W, len(docs))):
                ia, ta = docs[a][1], docs[a][2]
                ib, tb = docs[b][1], docs[b][2]
                ga, gb = bigrams(ta), bigrams(tb)
                union = len(ga | gb)
                if not union:
                    continue
                j = len(ga & gb) / union
                if j >= 0.05:
                    out[(min(ia, ib), max(ia, ib))] = round(j, 6)
    return out


def test_sorted_neighborhood_matches_pure_python(spark, tmp_path):
    # shared-prefix near-dups land adjacent in sort order even when their
    # SOURCES differ (the case (lang, source) blocking cannot pair);
    # doc 6 shares a prefix with 0/1 but is > W positions away from 9
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "web"),
        (1, "alpha beta gamma delta epsilon eta", "en", "books"),
        (2, "bravo charlie delta echo foxtrot", "en", "web"),
        (3, "bravo charlie delta echo golf", "en", "wiki"),
        (4, "charlie delta echo foxtrot golf", "en", "web"),
        (5, "delta echo foxtrot golf hotel", "en", "web"),
        (6, "alpha beta gamma delta zeta eta", "en", "news"),
        (7, "echo foxtrot golf hotel india", "en", "web"),
        (8, "foxtrot golf hotel india juliet", "en", "web"),
        (9, "zulu yankee xray whiskey victor", "en", "web"),
        # other-lang twin of doc 0: never paired across langs
        (10, "alpha beta gamma delta epsilon zeta", "de", "web"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_sorted_neighborhood"](
            spark, str(tmp_path)
        ).collect()
    }
    want = _py_snm(rows)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], k
    # the cross-source shared-prefix pair is the point of the method
    assert (0, 1) in got and (0, 6) in got
    # cross-lang twin excluded by the per-lang partition
    assert not any(10 in k for k in got)


def _py_ewma(rows: list[tuple]) -> dict[tuple, int]:
    daily: dict[tuple, int] = {}
    for _eid, ts, _uid, etype, value, _props in rows:
        key = (etype, ts.date())
        daily[key] = daily.get(key, 0) + round(value * 100)
    out: dict[tuple, int] = {}
    for etype in {k[0] for k in daily}:
        days = sorted(d for e, d in daily if e == etype)
        d0 = days[0]
        pre = 0
        for d in days:
            k = (d - d0).days
            if k > 29:
                continue
            pre += daily[(etype, d)] * 2**k
            out[(etype, d)] = pre * 2 ** (29 - k)
    return out


def test_ewma_matches_pure_python(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    # type A: 5 consecutive days; type B: gap days (k jumps 0 -> 3)
    for day, cents in [(0, 100), (1, 200), (2, 50), (3, 0), (4, 999)]:
        rows.append(
            (eid, base + dt.timedelta(days=day), 1, "A", cents / 100, "p")
        )
        eid += 1
    for day, cents in [(0, 700), (3, 300)]:
        rows.append(
            (eid, base + dt.timedelta(days=day), 2, "B", cents / 100, "q")
        )
        eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r["event_type"], r["day"]): r["ewma_num"]
        for r in QUERIES["ewma_daily_event_value"](
            spark, str(tmp_path)
        ).collect()
    }
    want = _py_ewma(rows)
    assert got == want
    # halving decay spot check: day-1 of type A = (100*1 + 200*2) * 2^28
    assert got[("A", dt.date(2024, 1, 2))] == (100 + 400) * 2**28
    # gap decay: type B day 3 = 700 * 2^-3 + 300 scaled by 2^29
    assert got[("B", dt.date(2024, 1, 4))] == (700 + 300 * 8) * 2**26


def test_l_diversity_entropy_and_distinct_thresholds(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    eid = 0
    # group U: uniform over 3 values -> entropy ln(3), diverse
    for p in ["x", "y", "z"]:
        rows.append((eid, base, eid, "U", 1.0, p))
        eid += 1
    # group S: 3 distinct but skewed (2,1,1) -> entropy ln4 - ln2/2 <
    # 1.0986 -> NOT diverse despite l_distinct = 3
    for p in ["x", "x", "y", "z"]:
        rows.append((eid, base, eid, "S", 1.0, p))
        eid += 1
    # group M: one value only
    rows.append((eid, base, eid, "M", 1.0, "x"))
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["event_type"]: r
        for r in QUERIES["l_diversity_audit"](spark, str(tmp_path)).collect()
    }
    u, s, m = got["U"], got["S"], got["M"]
    assert (u["l_distinct"], u["l_diverse"]) == (3, True)
    assert u["l_entropy"] == round(math.log(3), 4)
    assert (s["l_distinct"], s["l_diverse"]) == (3, False)
    assert s["l_entropy"] == round(math.log(4) - math.log(2) / 2, 4)
    assert (m["l_distinct"], m["l_entropy"], m["l_diverse"]) == (1, 0.0, False)
