"""Batch-granular atomic commits for streaming parquet sinks.

The reference saves atomically: write to ``<path>.tmp`` then rename(2)
into place (ext/blurrily/storage.c:371-374). Structured Streaming re-runs
a micro-batch after a sink failure, so the streaming analogue needs two
properties a bare ``mode('append')`` parquet write lacks:

* **replay idempotence** -- a retried batchId must not double-append;
* **torn-batch invisibility** -- a batch that crashed mid-write must
  leave nothing visible to readers.

:class:`BatchSink` provides both with plain parquet plus the Hadoop
FileSystem API (no table format ships in this sandbox; on a real cluster
this is an Iceberg/Delta append whose commit is already
batchId-idempotent via ``txnAppId``/``txnVersion``):

* each micro-batch writes its rows to its own subdirectory
  ``<dir>/batch-<id>`` with ``mode('overwrite')`` -- a retry after a
  torn write simply replaces the debris;
* the batch becomes visible only when the zero-byte marker
  ``<dir>/_committed/<id>`` is created (the rename(2) moment);
* readers -- including the in-stream membership anti-joins -- see
  exactly the union of committed batch directories;
* a replayed batchId whose marker already exists is a NO-OP.

Multiple sinks fed by one micro-batch (e.g. the dedup stream's pairs +
signatures) stay consistent because every write is a deterministic pure
function of (batch rows, history-minus-this-batch): writers read the
history with ``read(exclude=batch_id)``, so a replay after ANY partial
commit recomputes identical outputs and overwrites/commits whichever
sinks are missing.

Every existence/listing probe goes through the Hadoop FileSystem API --
never ``os.listdir`` -- so the sink works unchanged against object
stores (``s3a://``, ``abfs://``, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


class BatchSink:
    """One streaming sink directory with batchId-granular atomic commits."""

    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.directory = directory.rstrip("/")
        self.committed_dir = f"{self.directory}/_committed"

    # -- commit protocol ---------------------------------------------------

    def batch_path(self, batch_id: int) -> str:
        return f"{self.directory}/batch-{int(batch_id)}"

    def _marker(self, batch_id: int):
        return _hadoop_fs(self.spark, f"{self.committed_dir}/{int(batch_id)}")

    def is_committed(self, batch_id: int) -> bool:
        fs, marker = self._marker(batch_id)
        return fs.exists(marker)

    def write(self, df: DataFrame, batch_id: int) -> None:
        """Stage the batch's rows (invisible until :meth:`commit`).

        ``overwrite`` of the per-batch directory makes a retried write
        self-cleaning: debris from a torn earlier attempt is replaced,
        never appended to.
        """
        df.write.mode("overwrite").parquet(self.batch_path(batch_id))

    def commit(self, batch_id: int) -> None:
        """Publish the batch: create the zero-byte marker (atomic create,
        the streaming analogue of the reference's rename(2))."""
        fs, marker = self._marker(batch_id)
        fs.mkdirs(marker.getParent())
        out = fs.create(marker, True)
        out.close()

    # -- read side -----------------------------------------------------------

    def committed_ids(self) -> list[int]:
        fs, cdir = _hadoop_fs(self.spark, self.committed_dir)
        if not fs.exists(cdir):
            return []
        ids = []
        for status in fs.listStatus(cdir):
            name = status.getPath().getName()
            if name.isdigit():
                ids.append(int(name))
        return sorted(ids)

    def read(self, exclude: int | None = None) -> DataFrame | None:
        """Union of all committed batches; None when nothing is committed.

        Torn (written-but-uncommitted) batch directories are invisible by
        construction -- only marker-backed paths are read. Writers pass
        ``exclude=batch_id`` so a replay of a partially-committed batch
        reads the history as it was BEFORE that batch and recomputes the
        identical outputs.
        """
        paths = [
            self.batch_path(i)
            for i in self.committed_ids()
            if exclude is None or i != int(exclude)
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)


def read_sink(spark: SparkSession, directory: str) -> DataFrame | None:
    """Read a :class:`BatchSink` directory (committed batches only)."""
    return BatchSink(spark, directory).read()
