"""Generate scale-probe datasets (sf1, sf10, ...) under REPO/.scaleprobe/.

VERDICT r5 task 3: SCALE.md's 100 TB arguments are plan-verified but were
never load-verified beyond sf0.1 — this builds real 10x datapoints so
per-query scaling exponents can be measured (tools/scale_probe.py).

Default run builds sf1 (10x of sf0.1). A second decade (sf10 = 100x of
sf0.1) chains the SAME per-step laws from sf1:

    python tools/make_scale_probe.py                                # sf1
    python tools/make_scale_probe.py --src .scaleprobe/sf1 \\
        --out .scaleprobe/sf10 --seed 4252                          # sf10

Chaining from sf1 (rather than 100x in one shot) keeps each step's
empirical-resampling law identical to the measured sf0.01 -> sf0.1 step,
so exponents measured on the sf1 -> sf10 edge mean the same thing as on
the sf0.1 -> sf1 edge.

The driver's sf dirs are read-only, so the scaled tables are synthesized
here, inside the repo, by extending the generator's own scaling law
(measured across sf0.01 -> sf0.1):

- documents: rows x10 (50k), SAME 5 langs / 20 sources / 31-word vocab,
  empirical unigram + doc-length + (lang, source) distributions sampled
  from sf0.1; ~4.5% of docs are near-copies of another doc (1-2 word
  edits) and ~0.2% exact copies, matching the measured near-dup rate
  (228 prefix-60 groups / 8 exact dups at sf0.1).
- events: rows x10 (1M), users x10 (15k), SAME 30-day window and
  event-type mix; value/props sampled from empirical marginals.
- embeddings: rows x4 (8k, the measured 500 -> 2000 law), 64-dim, same
  10 labels, per-label Gaussian at the empirical centroid/std so the
  cluster structure IVF/k-means relies on is preserved.
- TPC-H tables: symlinked from sf0.1 (probe queries cover the
  documents / events / embeddings families only; exponents are claimed
  for those tables alone).

Deterministic (seed 4242). Idempotent: skips tables already built.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scaleprobe", "sf1")
SEED = 4242
DOC_X, EVT_X, EMB_X = 10, 10, 4


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))

def _write(table, name: str) -> None:
    """Write with BOUNDED ROW GROUPS (~64 per table). pyarrow's default
    single giant row group is unsplittable — Spark byte-range splits
    align to row-group starts, so a 1-row-group file scans as ONE task
    no matter how many partitions/cores exist. That single-task map side
    was the round-8 revised diagnosis for every 'cache eviction'
    super-linear probe exponent of rounds 6-7 (one straggler task at
    (13+1)/14 carrying the whole tokenize pipeline). 64 groups saturate
    a 32-core box at every SF while keeping metadata bounded; production
    data written by Spark itself (TableStorage sinks) already gets
    bounded groups from the 128 MB file-split discipline."""
    pq.write_table(
        table,
        os.path.join(OUT, f"{name}.parquet"),
        row_group_size=max(table.num_rows // 64, 4096),
    )


def build_documents(rng: np.random.Generator) -> None:
    t = _read("documents")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    n_src = len(texts)
    n_out = n_src * DOC_X

    # empirical unigram distribution + doc lengths (in words)
    from collections import Counter

    cnt: Counter[str] = Counter()
    lens = np.empty(n_src, dtype=np.int64)
    for i, s in enumerate(texts):
        ws = s.split(" ")
        lens[i] = len(ws)
        cnt.update(ws)
    vocab = np.array(sorted(cnt))
    probs = np.array([cnt[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()

    # block (lang, source) joint: resample with the same joint frequencies
    pair_idx = rng.integers(0, n_src, size=n_out)
    out_lang = [langs[i] for i in pair_idx]
    out_source = [sources[i] for i in pair_idx]

    out_len = lens[rng.integers(0, n_src, size=n_out)]
    out_text: list[str] = []
    words_flat = rng.choice(len(vocab), size=int(out_len.sum()), p=probs)
    pos = 0
    for L in out_len:
        out_text.append(" ".join(vocab[words_flat[pos:pos + L]]))
        pos += L

    # near-dup structure: ~4.5% near-copies (1-2 word edits), ~0.2% exact
    n_near = int(n_out * 0.045)
    n_exact = int(n_out * 0.002)
    victims = rng.choice(n_out, size=n_near + n_exact, replace=False)
    donors = rng.integers(0, n_out, size=n_near + n_exact)
    for k, (v, d) in enumerate(zip(victims, donors)):
        if v == d:
            continue
        if k < n_exact:
            out_text[v] = out_text[d]
        else:
            ws = out_text[d].split(" ")
            for _ in range(int(rng.integers(1, 3))):
                ws[int(rng.integers(0, len(ws)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))]
                )
            out_text[v] = " ".join(ws)
        # near-copies share the donor's block so blocked/bucketed dedup
        # paths can actually pair them (matches the source generator,
        # where near-dups cluster inside a (lang, source) block)
        out_lang[v] = out_lang[d]
        out_source[v] = out_source[d]

    out = pa.table(
        {
            "doc_id": pa.array(np.arange(n_out, dtype=np.int64)),
            "text": pa.array(out_text, type=pa.string()),
            "lang": pa.array(out_lang, type=pa.string()),
            "source": pa.array(out_source, type=pa.string()),
            "n_chars": pa.array(
                np.array([len(s) for s in out_text], dtype=np.int64)
            ),
        }
    )
    _write(out, "documents")


def build_events(rng: np.random.Generator) -> None:
    t = _read("events")
    n_src = t.num_rows
    n_out = n_src * EVT_X
    ts = t.column("ts").cast(pa.int64()).to_numpy()  # microseconds
    etype = np.asarray(t.column("event_type").to_pylist())
    value = t.column("value").to_numpy()
    props = np.asarray(t.column("props").to_pylist())
    n_users = int(
        pa.compute.count_distinct(t.column("user_id")).as_py()
    ) * EVT_X

    idx = rng.integers(0, n_src, size=n_out)
    # fresh uniform timestamps over the SAME 30-day window, sorted so the
    # file keeps the generator's time-ordered layout (footer-stats
    # pruning behaves the same way)
    out_ts = np.sort(
        rng.integers(ts.min(), ts.max() + 1, size=n_out, dtype=np.int64)
    )
    out = pa.table(
        {
            "event_id": pa.array(np.arange(n_out, dtype=np.int64)),
            "ts": pa.array(out_ts, type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_out, dtype=np.int64)
            ),
            "event_type": pa.array(etype[idx], type=pa.string()),
            "value": pa.array(value[idx], type=pa.float64()),
            "props": pa.array(props[idx], type=pa.string()),
        }
    )
    _write(out, "events")


def build_embeddings(rng: np.random.Generator) -> None:
    t = _read("embeddings")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    n_out = t.num_rows * EMB_X
    out_label = label[rng.integers(0, len(label), size=n_out)]
    vecs = np.empty((n_out, emb.shape[1]), dtype=np.float32)
    for lb in np.unique(label):
        c = emb[label == lb]
        mu, sd = c.mean(axis=0), c.std(axis=0)
        mask = out_label == lb
        vecs[mask] = rng.normal(
            mu, np.maximum(sd, 1e-6), size=(int(mask.sum()), emb.shape[1])
        ).astype(np.float32)
    out = pa.table(
        {
            "vec_id": pa.array(np.arange(n_out, dtype=np.int64)),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(out_label.astype(np.int32)),
        }
    )
    _write(out, "embeddings")


def main() -> int:
    global SRC, OUT, SEED
    argv = sys.argv[1:]
    while argv:
        flag = argv.pop(0)
        val = argv.pop(0)
        if flag == "--src":
            SRC = val
        elif flag == "--out":
            OUT = val
        elif flag == "--seed":
            SEED = int(val)
        else:
            raise SystemExit(f"unknown flag {flag}")
    os.makedirs(OUT, exist_ok=True)
    for tpch in (
        "region nation customer supplier part orders lineitem".split()
    ):
        dst = os.path.join(OUT, f"{tpch}.parquet")
        if not os.path.exists(dst):
            # resolve through a chained SRC (sf1's tpch files are
            # themselves symlinks into the read-only sf0.1 dir)
            os.symlink(
                os.path.realpath(os.path.join(SRC, f"{tpch}.parquet")), dst
            )
    for i, (name, fn) in enumerate(
        (
            ("documents", build_documents),
            ("events", build_events),
            ("embeddings", build_embeddings),
        )
    ):
        p = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(p):
            print(f"skip {name} (exists)")
        else:
            # per-table rng stream: a shared sequential rng would make a
            # partial rebuild (one table deleted) produce different data
            # than a fresh full build, breaking the determinism claim
            fn(np.random.default_rng(SEED + i))
            print(f"built {name}: {pq.read_metadata(p).num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
