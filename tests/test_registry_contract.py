"""Registry-wide driver-contract guards.

The driver runs every entry in ``__spark_entry__.queries()`` and
canonicalizes the result via pandas (sort columns by name, hash values).
Two failure classes killed the round-1 sweep and are pinned here:

1. A query that fails *analysis* (e.g. ``unix_micros`` over the
   TIMESTAMP_NTZ the driver's parquet actually produces) aborts the bench.
   ``df.schema`` forces full analysis of the logical plan against the REAL
   driver parquet files — every registered query must analyze cleanly.
2. An Array/Map-typed output column crashes pandas' canonicalizer
   (``unhashable type: numpy.ndarray``) and aborts the sweep for every
   query registered after it. Registered outputs must be scalar-only.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from weather_data_ingestion_gcp_spark.plans import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"

_NAMES = sorted(QUERIES)


@pytest.fixture(scope="module")
def schemas(spark):
    """Analyze every registered query once against the real driver parquet.

    ``df.schema`` triggers analysis (type resolution, function binding)
    without executing — all ~130 queries check in seconds.
    """
    out = {}
    for name in _NAMES:
        try:
            out[name] = QUERIES[name](spark, SF_DIR).schema
        except Exception as exc:  # keep sweeping; report per-query below
            out[name] = exc
    return out


@pytest.mark.parametrize("name", _NAMES)
def test_query_analyzes(schemas, name):
    res = schemas[name]
    assert not isinstance(res, Exception), f"{name} failed analysis: {res!r}"


@pytest.mark.parametrize("name", _NAMES)
def test_no_complex_output_columns(schemas, name):
    res = schemas[name]
    if isinstance(res, Exception):
        pytest.skip("analysis failed; covered by test_query_analyzes")
    bad = [
        f.name
        for f in res.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} emits complex-typed columns {bad}; the driver canonicalizer "
        "only hashes scalars — array_join/to_json/posexplode them"
    )


@pytest.mark.parametrize("name", _NAMES)
def test_no_duplicate_output_columns(schemas, name):
    """Duplicate column names break pandas-side canonicalization (column
    selection by label becomes ambiguous) — same crash class as complex
    types, pinned the same way."""
    res = schemas[name]
    if isinstance(res, Exception):
        pytest.skip("analysis failed; covered by test_query_analyzes")
    names = [f.name for f in res.fields]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"{name} emits duplicate column names: {dupes}"


@pytest.fixture(scope="module")
def duck_types():
    """DESCRIBE every oracle in DuckDB (no execution) against the real
    driver parquet — the oracle's output types, exactly as the driver's
    DuckDB side will produce them."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out = {}
    for name, sql in ORACLE.items():
        try:
            out[name] = {
                r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
            }
        except Exception as exc:
            out[name] = exc
    con.close()
    return out


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_type_classes_match_spark(schemas, duck_types, name):
    """The driver hashes the Spark result and the DuckDB oracle result
    independently, so a logical-type CLASS mismatch (DuckDB's SUM(BIGINT)
    -> HUGEINT/decimal128 vs Spark's SUM(BIGINT) -> int64) is a red
    driver row even when every value matches — this killed
    sessionize_events for rounds 1-3. Pin the whole class: every oracle
    column's type class must equal the Spark column's, and no oracle may
    emit decimal at all (CAST the SUM to BIGINT / DOUBLE instead)."""
    from weather_data_ingestion_gcp_spark.plans.registry import type_class

    d = duck_types[name]
    assert not isinstance(d, Exception), f"{name} DESCRIBE failed: {d!r}"
    s = schemas[name]
    if isinstance(s, Exception):
        pytest.skip("analysis failed; covered by test_query_analyzes")
    s_types = {f.name: f.dataType.simpleString() for f in s.fields}
    decimals = [c for c, t in d.items() if type_class(t) == "decimal"]
    assert not decimals, (
        f"{name} oracle emits decimal/HUGEINT columns {decimals}; "
        "CAST the aggregate to BIGINT (outside the SUM) or divide to DOUBLE"
    )
    mismatch = [
        (c, s_types[c], d[c])
        for c in s_types
        if c in d and type_class(s_types[c]) != type_class(d[c])
    ]
    assert not mismatch, (
        f"{name} type-class mismatches (col, spark, duckdb): {mismatch}"
    )


def test_every_oracle_has_a_query():
    missing = sorted(set(ORACLE) - set(QUERIES))
    assert not missing, f"oracle entries without a registered query: {missing}"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Schema-identical parquet tables with zero rows — the degenerate
    input every operator must survive (empty partitions/day-slices are
    routine at 100 TB)."""
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("sf_empty")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    """No registered query may crash on empty inputs — eager driver-side
    seeds (k-means, MMR query vectors, CC probes) must degrade to empty
    results, not exceptions."""
    failures = []
    for name in _NAMES:
        try:
            QUERIES[name](spark, empty_sf_dir).limit(5).collect()
        except Exception as exc:
            failures.append(f"{name}: {type(exc).__name__}")
    assert not failures, f"queries crashing on empty input: {failures}"


def test_driver_window_is_pinned():
    """The correctness driver hard-checks the FIRST 50 registry entries;
    ordering is therefore evidence allocation, and a stray registration
    must not silently evict driver coverage. Round 3 front-loads the
    LLM-pipeline block (never driver-checked in rounds 1-2) plus
    sessionize_events; see plans/__init__.py DRIVER_WINDOW and
    COVERAGE.md for the rationale and rotation history."""
    from weather_data_ingestion_gcp_spark.plans import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert list(QUERIES)[:50] == DRIVER_WINDOW


def test_load_table_memoizes_per_session_and_dir(spark):
    """load_table returns the SAME analyzed DataFrame object for repeat
    calls (kills the per-call spark.read.parquet re-analysis behind the
    suite's per-query floor) and distinct objects across sf dirs — a
    plan memo, never a cross-dataset alias."""
    from weather_data_ingestion_gcp_spark.plans.registry import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "documents")
    b = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert a is b
    c = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert c is not a
    # events normalization survives the memo (ts is TIMESTAMP, not NTZ/long)
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    assert e is load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(e.dtypes)["ts"] == "timestamp"


def test_run_after_graph_is_flat_and_resolvable():
    """_apply_driver_window does not support follower chains (a follower
    anchoring on another follower would be silently appended at the
    tail, exactly the cache-adjacency break the map exists to prevent)
    and an unregistered anchor would likewise dump its follower at the
    tail. Pin both properties, plus: every follower actually lands
    immediately after its anchor in the final suite order (or inside
    the contiguous follower run of that anchor), unless the follower
    itself is pulled into the driver window."""
    from weather_data_ingestion_gcp_spark.plans import (
        DRIVER_WINDOW,
        RUN_AFTER,
    )

    followers = set(RUN_AFTER)
    for follower, anchor in RUN_AFTER.items():
        assert anchor in QUERIES, f"anchor {anchor} not registered"
        assert anchor not in followers, (
            f"{follower} anchors on {anchor}, itself a follower — "
            "chains are unsupported; anchor FLAT on the block head"
        )
    order = list(QUERIES)
    window = set(DRIVER_WINDOW)
    pos = {n: i for i, n in enumerate(order)}
    for follower, anchor in RUN_AFTER.items():
        if follower in window:
            continue  # the window orders it explicitly
        if anchor in window:
            # window-internal anchors: their followers form the
            # post-window prefix (ordered by anchor position); require
            # only that nothing NON-follower separates them from the
            # boundary — two window anchors' groups legally queue
            for between in order[len(DRIVER_WINDOW) : pos[follower]]:
                assert RUN_AFTER.get(between) in window, (
                    f"{between} separates {follower} from the window "
                    f"boundary (anchor {anchor} is inside the window)"
                )
            continue
        # contiguity: everything between the anchor and this follower
        # is a follower of the SAME anchor
        for between in order[pos[anchor] + 1 : pos[follower]]:
            assert RUN_AFTER.get(between) == anchor, (
                f"{between} separates {follower} from its anchor {anchor}"
            )
