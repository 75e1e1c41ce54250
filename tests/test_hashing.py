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


def test_simhash_packed_lane_guard_raises_on_huge_doc(spark):
    """simhash62 packs per-bit counters 3-to-an-int64 (21-bit lanes); a
    document beyond the 2^21-1 token bound must fail loudly, not silently
    corrupt the fingerprint."""
    import pytest
    from pyspark.sql import functions as F

    from blurrily_spark.operators.dedup import simhash62

    # unique LETTER tokens (normalization strips digits): per-bit counts
    # stay ~n/2 (no lane carry, no int64 overflow), so the n >= 2^21 guard
    # itself must fire
    def b26(i):
        out = None
        for d in range(5):
            ch = F.char(F.lit(97) + F.shiftright(i, 5 * d).bitwiseAND(F.lit(31)) % 26)
            out = ch if out is None else F.concat(out, ch)
        return out

    big = spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(2_097_152)), b26), " "
        ).alias("text"),
    )
    with pytest.raises(Exception, match="packed-lane counter bound"):
        simhash62(big, hash_fn="fast").collect()
