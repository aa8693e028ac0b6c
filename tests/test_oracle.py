"""Driver-shaped correctness harness: run every queries() entry on Spark
at sf0.01 and its oracle_sql() twin in DuckDB on the same parquet tables;
compare row count, column names, and the full multiset of values (floats
compared exactly — the queries round in-query, so exact match is the
contract)."""
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    # EXACT comparison, even for floats: every compared float column is
    # rounded in-query and computed with bit-identical cross-engine
    # arithmetic (poly-cos, shared templates), so repr equality must hold —
    # this is what makes the driver's value-hash comparison engine-proof.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLES = entry_mod.oracle_sql()
QUERY_NAMES = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLES))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    o = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    con = _duck()
    try:
        res = con.execute(o)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sset = _rows_to_multiset(scols, [tuple(r) for r in srows])
    oset = _rows_to_multiset(ocols, orows)
    if sset != oset:
        diff_s = [r for r in sset if r not in oset][:3]
        diff_o = [r for r in oset if r not in sset][:3]
        raise AssertionError(f"{name}: value mismatch; spark-only={diff_s} oracle-only={diff_o}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
