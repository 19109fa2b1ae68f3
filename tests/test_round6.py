"""Round-6 entries against independent pure-Python/numpy references —
a third opinion beside the DuckDB oracle (the oracle mirrors the SQL
formulation; these mirror the DEFINITION)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from weather_data_ingestion_gcp_spark.plans import QUERIES


def _write_documents(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{path}/documents.parquet")


def _py_rouge(cand: str, ref: str, n: int) -> tuple:
    def grams(s: str) -> Counter:
        ws = [w for w in s.lower().split() if w]
        return Counter(
            " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)
        )

    ca, cb = grams(cand), grams(ref)
    ov = sum(min(c, cb[g]) for g, c in ca.items())
    ta, tb = sum(ca.values()), sum(cb.values())
    p = ov * 1000000 // ta if ta else None
    r = ov * 1000000 // tb if tb else None
    f = (
        (2 * p * r) // (p + r)
        if p is not None and r is not None and (p + r)
        else None
    )
    return p, r, f


def test_rouge_matches_pure_python_reference(spark, tmp_path):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the red mat today"),
        (2, "alpha beta beta gamma beta"),
        (3, "beta beta delta alpha alpha"),
        (4, "single"),           # no bigrams on either side
        (5, "word"),
        (6, "totally disjoint tokens here"),
        (7, "nothing shared at all whatsoever"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        r["pair_id"]: r
        for r in QUERIES["rouge_overlap_eval"](spark, str(tmp_path)).collect()
    }
    texts = dict(rows)
    assert set(got) == {0, 2, 4, 6}
    for pid in got:
        cand, ref = texts[pid], texts[pid + 1]
        for n, tag in ((1, "1"), (2, "2")):
            p, r, f = _py_rouge(cand, ref, n)
            assert got[pid][f"rouge{tag}_p_ppm"] == p, (pid, tag)
            assert got[pid][f"rouge{tag}_r_ppm"] == r, (pid, tag)
            assert got[pid][f"rouge{tag}_f_ppm"] == f, (pid, tag)
    # sanity on the known pair — clipped counts, not distinct:
    # alpha(1 vs 2)->1, beta(3 vs 2)->2, gamma(1 vs 0)->0 => ov=3, ta=5
    assert got[2]["rouge1_p_ppm"] == 3 * 1000000 // 5


def test_rerank_matches_numpy_reference(spark, tmp_path):
    np = pytest.importorskip("numpy")
    rng = np.random.RandomState(11)
    vecs = (rng.rand(30, 6) - 0.5).astype("float32")
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(30)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    out = QUERIES["rerank_two_stage_topk"](spark, str(tmp_path)).collect()
    got = {(r["q_id"], r["rk_rerank"]): r for r in out}
    v = vecs.astype("float64")
    m = np.floor(v * 1000).astype("int64")
    for q in range(8):
        sims = v @ v[q] / (
            np.linalg.norm(v, axis=1) * np.linalg.norm(v[q])
        )
        cand = sorted(
            ((-s, i) for i, s in enumerate(sims) if i != q)
        )[:20]
        scores = []
        for _negs, i in cand:
            s = int(
                np.sum(
                    np.minimum(np.abs(m[q]), np.abs(m[i]))
                    * np.sign(m[q]) * np.sign(m[i])
                )
            )
            scores.append((-s, i))
        for rk, (negscore, i) in enumerate(sorted(scores)[:5], start=1):
            row = got[(q, rk)]
            assert row["n_id"] == i, (q, rk)
            assert row["rerank_score"] == -negscore, (q, rk)


def test_rouge_pairs_require_both_sides(spark, tmp_path):
    """A candidate whose reference doc_id+1 is absent must not emit a
    row (inner pairing), and NULL ppm appears only for gram-order
    starvation, not missing pairs."""
    _write_documents(
        spark, str(tmp_path), [(0, "a b c"), (1, "a b d"), (4, "orphan pair")]
    )
    got = QUERIES["rouge_overlap_eval"](spark, str(tmp_path)).collect()
    assert [r["pair_id"] for r in got] == [0]
