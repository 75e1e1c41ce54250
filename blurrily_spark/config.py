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

# InferFiltersFromGenerate injects `size(tg) > 0 AND isnotnull(tg)` below the
# tokenizer projections, re-inlining the whole trigram expression into a
# per-row Filter where the char-codes transform is re-evaluated per
# element_at -- O(n^2) interpreted work per document (measured 30x slowdown
# on the postings build). Our trigram arrays are never empty (a string of
# length n yields n+1 >= 1 windows, tokeniser.c:72-75), so the inferred
# filter can never prune a row: excluding the rule is pure win.
_EXCLUDED_RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def tune_session(spark: "SparkSession") -> None:
    """Idempotently apply engine-required session tuning (safe to call on a
    session we did not create, e.g. the driver's)."""
    try:
        cur = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        cur = None
    rules = {r for r in (cur or "").split(",") if r}
    if _EXCLUDED_RULE not in rules:
        rules.add(_EXCLUDED_RULE)
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(sorted(rules)))


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
    tune_session(spark)
    return spark
