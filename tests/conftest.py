from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .appName("blurrily-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session


def put_rows(spark: SparkSession, rows: list[tuple]):
    """Build a haystack DataFrame from (needle, ref[, weight]) tuples with
    arrival order preserved (the reference's put sequence)."""
    norm_rows = []
    for i, r in enumerate(rows):
        needle, ref = r[0], r[1]
        weight = r[2] if len(r) > 2 else 0
        norm_rows.append((i, needle, ref, weight))
    return spark.createDataFrame(
        norm_rows, "seq long, needle string, ref long, weight int"
    )
