"""t2 — local replica of the driver's correctness gate: every queries()
entry with an oracle_sql() twin must match DuckDB on row count, schema
arity, and order-insensitive values at sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(val):
    if val is None:
        return None
    if isinstance(val, bool):
        return int(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # driver-style canonicalization: floats to 6 significant-ish places
        return round(val, 6)
    if isinstance(val, int):
        return val
    return str(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert s_set == d_set, f"{name}: first mismatches {mism[:3]}"


def test_all_queries_oracle_backed():
    """r4 invariant: NO rows-only queries remain — every contract query
    has a DuckDB oracle (the formerly-approximate six gained
    planted-fixture closed forms)."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_bench_times_every_query():
    """Drift guard: every contract query must be in bench.py's
    HEADLINE_QUERIES (and bench must not time ghosts)."""
    import bench

    assert set(bench.HEADLINE_QUERIES) == set(QUERIES), (
        sorted(set(QUERIES) - set(bench.HEADLINE_QUERIES)),
        sorted(set(bench.HEADLINE_QUERIES) - set(QUERIES)),
    )
