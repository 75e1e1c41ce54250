"""Merge-on-read deletes (round-4 verdict #5): W4 semantics with
O(deleted-refs) writes -- the parquet stand-in for Iceberg equality
deletes. Reference semantics pinned: removal (map_spec.rb:79-95),
duplicate tombstones (96-102), missing refs (104-106), re-adds after
delete (108-113)."""

from __future__ import annotations

import os

from blurrily_spark.operators.find import find_one
from blurrily_spark.operators.index import build_postings, stats
from blurrily_spark.streaming.sink import MergeOnReadStore


def _postings(spark, rows):
    docs = spark.createDataFrame(rows, "needle string, ref long")
    return build_postings(docs, text_col="needle", ref_col="ref")


def _data_files(directory):
    out = {}
    for root, _dirs, files in os.walk(directory):
        if "_tombstones" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_mor_delete_and_find_golden(spark, tmp_path):
    store = MergeOnReadStore(spark, str(tmp_path / "mor"))
    store.append(_postings(spark, [("london", 123), ("paris", 7)]))

    before = find_one(store.read(), "london").collect()
    assert [r["ref"] for r in before] == [123]

    store.delete([123])
    # find-after-delete: london gone, paris untouched (map_spec.rb:79-84)
    assert find_one(store.read(), "london").where("ref = 123").count() == 0
    assert [r["ref"] for r in find_one(store.read(), "paris").collect()] == [7]
    st = stats(store.read()).collect()[0]
    assert st["references"] == 1

    # duplicate tombstones and missing refs are no-ops (map_spec.rb:96-106)
    store.delete([123, 123, 999])
    assert stats(store.read()).collect()[0]["references"] == 1


def test_mor_delete_permits_readds(spark, tmp_path):
    """map_spec.rb:108-113: delete 1337, then put 'paris', 1337 -> found.
    The tombstone's as_of sequence erases only rows committed before it."""
    store = MergeOnReadStore(spark, str(tmp_path / "mor"))
    store.append(_postings(spark, [("london", 1337)]))
    store.delete([1337])
    store.append(_postings(spark, [("paris", 1337)]))

    assert [r["ref"] for r in find_one(store.read(), "paris").collect()] == [1337]
    assert find_one(store.read(), "london").where("matches >= 3").count() == 0

    # ... and the fold preserves exactly that state
    assert store.compact() is True
    assert [r["ref"] for r in find_one(store.read(), "paris").collect()] == [1337]
    assert find_one(store.read(), "london").where("matches >= 3").count() == 0


def test_mor_delete_writes_no_snapshot_rewrite(spark, tmp_path):
    """The delete itself is O(deleted refs): every data file's (size,
    mtime) is untouched and only the _tombstones sidecar grows."""
    d = str(tmp_path / "mor")
    store = MergeOnReadStore(spark, d)
    store.append(_postings(spark, [(f"needle number {i}", i) for i in range(50)]))

    snapshot = _data_files(d)
    assert snapshot  # data files exist
    store.delete([3, 7, 11])
    assert _data_files(d) == snapshot, "delete must not rewrite data files"
    tomb_dir = os.path.join(d, "_tombstones")
    assert os.path.isdir(tomb_dir)

    # reading honors the tombstones without touching the data layout
    refs = {r["ref"] for r in store.read().select("ref").distinct().collect()}
    assert refs == set(range(50)) - {3, 7, 11}
    assert _data_files(d) == snapshot


def test_mor_compact_folds_tombstones_and_bounds_paths(spark, tmp_path):
    d = str(tmp_path / "mor")
    store = MergeOnReadStore(spark, d)
    for batch in range(3):
        store.append(
            _postings(
                spark,
                [(f"text {batch} {i}", batch * 100 + i) for i in range(10)],
            )
        )
    store.delete([0, 101, 202])
    expected = sorted(
        r["ref"] for r in store.read().select("ref").distinct().collect()
    )

    assert store.compact() is True
    # one base path, no batch dirs, empty tombstone sidecar
    assert store.data.read_paths() == [store.data.base_path(1)]
    # the sidecar folded to an empty base: zero live tombstones, and
    # its read side is one (empty) path, not a growing batch list
    assert store.tombstones.read().count() == 0
    assert store.tombstones.read_paths() == [store.tombstones.base_path(1)]
    got = sorted(r["ref"] for r in store.read().select("ref").distinct().collect())
    assert got == expected
    assert 0 not in got and 101 not in got and 202 not in got

    # post-compaction deletes start a fresh tombstone cycle
    store.delete([1])
    assert 1 not in {
        r["ref"] for r in store.read().select("ref").distinct().collect()
    }
