"""Session construction + engine defaults.

Defaults mirror the reference's constants (lib/blurrily/defaults.rb):
LIMIT_DEFAULT=10, weight 0 => "use normalized length"
(ext/blurrily/storage.c:409). References are widened from uint32 to int64 --
the 32-bit bound is an implementation limit of the C engine, not a behavior
(SURVEY.md §7.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

LIMIT_DEFAULT = 10      # lib/blurrily/defaults.rb:6
LIMIT_RANGE = (1, 1024)  # lib/blurrily/defaults.rb:7


def get_spark(
    app_name: str = "blurrily-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, the same package is shipped via
    ``spark-submit --py-files`` and ``master`` is left to the submitter.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
