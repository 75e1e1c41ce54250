"""Cross-engine parity of the portable hash family.

The sketch operators' oracle-exactness rests on poly_hash (Spark) and
poly_hash_sql (DuckDB) producing identical values; this pins the layer
directly, including the ''-input and non-letter edge cases, over random
strings (seeded hypothesis).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from blurrily_spark.functions.hashing import (
    MERSENNE,
    POLY_BASE_B,
    chunk_bounds,
    poly_hash,
    poly_hash_sql,
)


def _poly_py(s: str, base: int = 31) -> int:
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % MERSENNE
    return acc


CASES = ["", "a", "paris", "great london", "zz top", " lead trail ", "x" * 300]


def test_python_twin_matches_duckdb():
    con = duckdb.connect()
    for s in CASES:
        for base in (31, POLY_BASE_B):
            got = con.execute(
                f"SELECT {poly_hash_sql('t', base)} FROM (SELECT ? AS t)", [s]
            ).fetchone()[0]
            assert got == _poly_py(s, base), (s, base)


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "t string")
    rows = df.select("t", poly_hash(F.col("t")).alias("h")).collect()
    for r in rows:
        assert r["h"] == _poly_py(r["t"]), r["t"]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64))
def test_duckdb_matches_python_on_random_ascii(s):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {poly_hash_sql('t')} FROM (SELECT ? AS t)", [s]
    ).fetchone()[0]
    assert got == _poly_py(s)


def test_chunk_bounds_contract():
    for total in (32, 62):
        for c in (1, 2, 7, total):
            bounds = chunk_bounds(c, total)
            assert len(bounds) == c
            assert bounds[0][0] == 0 and bounds[-1][1] == total
            assert all(lo < hi for lo, hi in bounds)  # non-empty
            assert all(
                bounds[i][1] == bounds[i + 1][0] for i in range(c - 1)
            )  # disjoint cover
    with pytest.raises(ValueError):
        chunk_bounds(63, 62)
