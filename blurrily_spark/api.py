"""Reference-API facade: ``Map`` / ``MapGroup`` with blurrily's surface.

Gives a user of the reference (``Blurrily::Map`` -- lib/blurrily/map.rb,
``Blurrily::MapGroup`` -- lib/blurrily/map_group.rb, and the wire commands
PUT/FIND/DELETE/CLEAR -- lib/blurrily/command_processor.rb) a drop-in
batch-backed equivalent:

    m = Map(spark)
    m.put("paris", 123)          # -> 6 (unique trigrams; 0 on dup ref)
    m.find("pariis")             # -> [(123, 5, 5)]
    m.delete(123)
    m.save("/path/db")           # parquet snapshot (atomic-rename analogue)
    m = Map.load(spark, "/path/db")

Semantics mirrored from the reference:
* put returns the needle's unique-trigram count, 0 if the ref is already
  stored (storage.c:398-473, dup-skip :408; golden map_spec.rb:38-41);
* weight <= 0 defaults to the normalized length (storage.c:409);
* find returns (ref, matches, weight) ordered (matches DESC, weight ASC,
  ref ASC), default limit 10 (storage.h:99-109, defaults.rb:6);
* save is memoized on a clean path (map.rb:25-30) and atomic (parquet
  overwrite commit replaces the reference's rename(2), storage.c:371-374);
* a ClosedError-equivalent guard after close() (map_ext.c:11-21).

Puts are buffered driver-side and flushed lazily into the postings
DataFrame (arrival order preserved => first-wins dedup is deterministic).
This facade targets interactive/compat use; the batch pipeline entry points
(operators/, plans/) are the 10^12-row path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blurrily_spark.config import LIMIT_DEFAULT
from blurrily_spark.functions.tokenizer import normalize_py, trigrams_py
from blurrily_spark.operators.find import find_one
from blurrily_spark.operators.index import POSTINGS_COLS, build_postings
from blurrily_spark.operators.index import stats as postings_stats


class ClosedError(RuntimeError):
    """Operation on a closed Map (ext/blurrily/map_ext.c:11-21)."""


class Map:
    def __init__(self, spark: SparkSession, postings: DataFrame | None = None):
        self._spark = spark
        self._postings = postings  # flushed state (None = empty)
        self._buffer: list[tuple[int, str, int, int]] = []  # (seq, needle, ref, weight)
        self._seq = 0
        self._refs: set[int] = (
            {r["ref"] for r in postings.select("ref").distinct().collect()}
            if postings is not None
            else set()
        )
        self._clean_path: str | None = None
        self._closed = False

    # -- guards ----------------------------------------------------------

    def _guard(self) -> None:
        if self._closed:
            raise ClosedError("map is closed")

    # -- write path -------------------------------------------------------

    def put(self, needle: str, ref: int, weight: int | None = None) -> int:
        """Returns the number of (unique) trigrams stored; 0 for a dup ref."""
        self._guard()
        ref = int(ref)
        if ref in self._refs:
            return 0
        norm = normalize_py(needle)
        n_trigrams = len(trigrams_py(norm))
        self._buffer.append((self._seq, needle, ref, int(weight or 0)))
        self._seq += 1
        self._refs.add(ref)
        self._clean_path = None
        return n_trigrams

    def delete(self, ref: int) -> None:
        self._guard()
        ref = int(ref)
        self._flush()
        if self._postings is not None:
            self._postings = self._postings.where(F.col("ref") != ref)
        self._refs.discard(ref)
        self._clean_path = None

    def clear(self) -> None:
        self._guard()
        self._postings = None
        self._buffer.clear()
        self._refs.clear()
        self._clean_path = None

    # -- read path ---------------------------------------------------------

    def find(self, needle: str, limit: int = LIMIT_DEFAULT) -> list[tuple[int, int, int]]:
        """[(ref, matches, weight), ...] -- reference Map#find semantics."""
        self._guard()
        self._flush()
        if self._postings is None:
            return []
        rows = find_one(self._postings, needle, limit=limit).collect()
        return [(r["ref"], r["matches"], r["weight"]) for r in rows]

    def stats(self) -> dict[str, int]:
        self._guard()
        self._flush()
        if self._postings is None:
            return {"references": 0, "trigrams": 0}
        row = postings_stats(self._postings).collect()[0]
        return {"references": row["references"], "trigrams": row["trigrams"]}

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        """Parquet snapshot; memoized while the map is unchanged (map.rb:25-30)."""
        self._guard()
        if self._clean_path == path:
            return
        self._flush()
        df = (
            self._postings
            if self._postings is not None
            else self._spark.createDataFrame([], "trigram int, ref long, weight int")
        )
        df.write.mode("overwrite").parquet(path)
        self._postings = self._spark.read.parquet(path)
        self._clean_path = path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Map":
        postings = spark.read.parquet(path).select(*POSTINGS_COLS)
        m = cls(spark, postings)
        m._clean_path = path
        return m

    def close(self) -> None:
        self._closed = True

    # -- internals ----------------------------------------------------------

    def _flush(self) -> None:
        if not self._buffer:
            return
        batch = self._spark.createDataFrame(
            self._buffer, "seq long, needle string, ref long, weight int"
        )
        new_postings = build_postings(batch, order_col="seq")
        self._postings = (
            new_postings
            if self._postings is None
            else self._postings.select(*POSTINGS_COLS).unionByName(new_postings)
        )
        # keep the lineage shallow for long interactive sessions
        self._postings = self._postings.localCheckpoint()
        self._buffer.clear()


class MapGroup:
    """Named multi-tenant maps (lib/blurrily/map_group.rb): one Map per db
    name, lazily loaded from ``directory`` if a saved snapshot exists."""

    def __init__(self, spark: SparkSession, directory: str = "."):
        self._spark = spark
        self._dir = directory
        self._maps: dict[str, Map] = {}

    def _path(self, name: str) -> str:
        return os.path.join(self._dir, f"{name}.trigrams")

    def map(self, name: str) -> Map:
        if name not in self._maps:
            path = self._path(name)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                self._maps[name] = Map.load(self._spark, path)
            else:
                self._maps[name] = Map(self._spark)
        return self._maps[name]

    def clear(self, name: str) -> Map:
        self._maps[name] = Map(self._spark)
        return self._maps[name]

    def save_all(self) -> None:
        for name, m in self._maps.items():
            m.save(self._path(name))
