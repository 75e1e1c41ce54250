"""Streaming sessionization: the stateful twin of ``operators.events``.

Batch :func:`~blurrily_spark.operators.events.sessionize` is a window
function over complete history; live ingestion cannot wait for "complete".
This module keeps ONE open session per user as Structured Streaming state
(``applyInPandasWithState``) and emits a session exactly once -- when the
EVENT-TIME WATERMARK passes its end + gap, i.e. when no in-order event can
extend it anymore. That is the textbook session-window-with-timeout
pattern: state eviction is driven by ``GroupStateTimeout.EventTimeTimeout``,
so idle users cost zero state once their last session closes, and the
output is append-mode (each closed session exactly once -- sinkable to
files/Kafka, not just update-mode memory).

Correctness contract vs the batch op: for events that arrive within the
watermark delay of event-time order, the closed sessions are exactly the
batch result (pinned by the batch-parity pytest). An event later than the
watermark is dropped by Spark's stateful-operator late-row filter -- the
same bound every watermarked aggregation in this repo declares. The batch
operator remains the backfill path and the oracle.

Scale shape: state is one 5-field row per user with an open session --
O(active users), not O(events) -- and each micro-batch shuffles only its
own rows by ``user_id`` (the same single-Exchange key as the batch op).
Arrow-batched pandas transfer, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

OUTPUT_SCHEMA = (
    "user_id long, session_seq int, n_events long, "
    "session_start timestamp, session_end timestamp, "
    "duration_s double, sum_value double"
)

# (next session's 1-based seq is open_seq+1; us = epoch microseconds)
STATE_SCHEMA = "seq int, start_us long, end_us long, n long, sum_value double"


def read_events_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    gap_seconds: float = 1800.0,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unstarted append-mode streaming DataFrame of CLOSED sessions.

    A session closes when the watermark (max event time seen minus
    ``watermark`` delay) passes ``session_end + gap_seconds`` -- via the
    state timeout, so closing needs no new event from that user. The open
    session per user stays in state until then; a query shutdown before
    the watermark reaches it simply re-opens it from the checkpoint.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds * 1_000_000)

    def _closed_frame(rows: list[tuple[int, int, int, int, int, float]]):
        return pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "session_seq": pd.Series([r[1] for r in rows], dtype="int32"),
                "n_events": pd.Series([r[4] for r in rows], dtype="int64"),
                "session_start": pd.to_datetime([r[2] for r in rows], unit="us"),
                "session_end": pd.to_datetime([r[3] for r in rows], unit="us"),
                "duration_s": pd.Series(
                    [(r[3] - r[2]) / 1_000_000.0 for r in rows], dtype="float64"
                ),
                "sum_value": pd.Series([r[5] for r in rows], dtype="float64"),
            }
        )

    def update(key, pdfs, state: GroupState):
        (user_id,) = key

        if state.hasTimedOut:
            # watermark passed end+gap: no in-order event can extend it
            seq, start_us, end_us, n, sumv = state.get
            state.remove()
            yield _closed_frame([(user_id, seq, start_us, end_us, n, sumv)])
            return

        if state.exists:
            seq, start_us, end_us, n, sumv = state.get
        else:
            seq, start_us, end_us, n, sumv = 0, None, None, 0, 0.0

        closed: list[tuple[int, int, int, int, int, float]] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
            pdf = pdf.sort_values(["_us", "event_id"])
            for us, val in zip(pdf["_us"].to_numpy(), pdf["value"].to_numpy()):
                us = int(us)
                if start_us is None:
                    seq, start_us, end_us, n, sumv = seq + 1, us, us, 1, float(val)
                elif us - end_us > gap_us:
                    closed.append((user_id, seq, start_us, end_us, n, sumv))
                    seq, start_us, end_us, n, sumv = seq + 1, us, us, 1, float(val)
                else:
                    end_us = max(end_us, us)
                    n += 1
                    sumv += float(val)

        if start_us is not None:
            state.update((seq, start_us, end_us, n, sumv))
            # fire once the watermark passes end+gap; must be strictly
            # beyond the current watermark or Spark rejects the timestamp
            timeout_ms = (end_us + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield _closed_frame(closed)

    src = read_events_stream(spark, input_dir, max_files_per_trigger)
    return (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
