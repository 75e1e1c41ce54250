"""Local mimic of the driver's correctness gate: run every __spark_entry__
query on sf0.001 and compare against its DuckDB oracle (row count, column
names, and exact multiset of values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize_cell(r[i]) for i in order) for r in rows)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    qdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_rows = qdf.collect()
    spark_cols = qdf.columns

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}"
    )
    sk = _rows_key([tuple(r) for r in spark_rows], spark_cols)
    dk = _rows_key(duck_rows, duck_cols)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run_and_are_deterministic(spark, name):
    q = ALL_QUERIES[name]
    a = _rows_key([tuple(r) for r in q(spark, SF_DIR).collect()], q(spark, SF_DIR).columns)
    b = _rows_key([tuple(r) for r in q(spark, SF_DIR).collect()], q(spark, SF_DIR).columns)
    assert a == b
    assert len(a) > 0, f"{name}: expected non-empty result"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["query_id", "ref", "matches", "weight", "rank"]


# ANN recall + codebook assertions live in tests/test_similarity.py.
