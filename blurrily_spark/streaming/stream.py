"""Structured Streaming ingest: transcripts stream -> live trigram index.

The reference's closest streaming behavior is the server's 60 s autosave
loop (lib/blurrily/server.rb:24-27) -- continuous puts periodically
committed to disk. Here that becomes a real stream: new transcript files
land in a directory, each micro-batch is tokenized with the same
expressions as the batch path, and postings are appended to a parquet
(Iceberg, on a real cluster) sink with checkpointed progress. The sink
honors W1's dup-ref no-op via a per-batch anti-join against stored refs
(deletes stay a batch/table operation, as in W4).

Also provides a watermarked windowed stats stream (turns/sec per role),
the streaming analogue of F7's counters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blurrily_spark.plans.pipeline import build_turns, turns_to_postings
from blurrily_spark.sources.synth import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_index_build(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "60 seconds",
):
    """Continuous index maintenance: stream of transcript turns -> postings
    appended to ``output_dir``.

    Each micro-batch runs the batch write path inside ``foreachBatch``:
    first-wins dedup within the batch, then a left-anti join against the
    sink's existing refs -- so a turn re-sent in a later file is a NO-OP,
    exactly the reference's put-on-seen-ref semantics
    (ext/blurrily/storage.c:408, spec/blurrily/map_spec.rb:61-67). A plain
    append sink cannot express this (it double-inserts postings and
    inflates FIND match counts).

    ``processing_time`` defaults to the reference's 60 s autosave cadence;
    ``available_now=True`` drains the current backlog and stops (used by
    tests and backfill). Restart resumes from the checkpoint -- the
    streaming face of the pipeline's resumability. At cluster scale the
    sink is an Iceberg/Delta table whose per-batch commit is atomic and
    batchId-idempotent; the parquet append is the sandbox stand-in (a
    mid-write crash can leave a torn batch that the table format would
    roll back).
    """
    src = read_transcripts_stream(spark, input_dir)

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        turns = build_turns(batch_df)
        # first-wins within the micro-batch (deterministic arrival order)
        win = Window.partitionBy("ref").orderBy(
            F.col("conv_id").asc(), F.col("turn_idx").asc()
        )
        fresh = (
            turns.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # W2 membership test against the sink: seen refs are skipped
        if os.path.isdir(output_dir) and any(
            f.endswith(".parquet") for f in os.listdir(output_dir)
        ):
            existing_refs = sess.read.parquet(output_dir).select("ref").distinct()
            fresh = fresh.join(existing_refs, "ref", "left_anti")
        turns_to_postings(fresh).write.mode("append").parquet(output_dir)

    writer = (
        src.writeStream.foreachBatch(_append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_minhash_dedup(
    spark: SparkSession,
    input_dir: str,
    sigs_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "60 seconds",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
):
    """Incremental near-duplicate detection over a transcript stream.

    Per micro-batch (foreachBatch):
      1. MinHash-sign the batch's turns (same portable signatures as the
         batch dedup path; ref = xxhash64(conv_id, turn_idx));
      2. banded-join the NEW signatures against ALL signatures seen so far
         (stored signature table) -- linear in the batch, never a
         history x history self-join; earlier cross-history pairs were
         already emitted by earlier batches;
      3. append qualifying pairs (est_jaccard >= threshold) to
         ``pairs_dir`` and the new signatures to ``sigs_dir``.

    This is the streaming face of a training-data dedup pipeline: documents
    arrive continuously and every batch is deduplicated against the entire
    corpus so far, at banded-join cost. At cluster scale both sinks are
    tables (the signature table bucketed by band hash).
    """
    from blurrily_spark.operators.dedup import (
        banded_signatures,
        lsh_pairs_between,
        minhash_signatures,
    )

    src = read_transcripts_stream(spark, input_dir)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        turns = build_turns(batch_df)
        win = Window.partitionBy("ref").orderBy(
            F.col("conv_id").asc(), F.col("turn_idx").asc()
        )
        fresh = (
            turns.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("ref", "norm")
        )
        new_sigs = minhash_signatures(
            fresh, id_col="ref", text_col="norm", num_hashes=num_hashes
        )
        existing = None
        if os.path.isdir(sigs_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sigs_dir)
        ):
            existing = sess.read.parquet(sigs_dir)
            new_sigs = new_sigs.join(existing.select("id"), "id", "left_anti")
        new_sigs = new_sigs.cache()
        try:
            new_banded = banded_signatures(new_sigs, num_hashes, bands)
            all_banded = (
                new_banded
                if existing is None
                else banded_signatures(existing, num_hashes, bands).unionByName(new_banded)
            )
            pairs = lsh_pairs_between(new_banded, all_banded, num_hashes, bands).where(
                F.col("est_jaccard") >= threshold
            )
            pairs.write.mode("append").parquet(pairs_dir)
            new_sigs.write.mode("append").parquet(sigs_dir)
        finally:
            new_sigs.unpersist()

    writer = (
        src.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_turn_stats(
    spark: SparkSession,
    input_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked per-window turn counters (streaming F7).

    Returns an unstarted aggregated streaming DataFrame; callers attach a
    sink (tests use the memory sink + availableNow).
    """
    src = read_transcripts_stream(spark, input_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.avg(F.length("text")).alias("avg_len"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "turns",
            "avg_len",
        )
    )


def stream_conversation_progress(
    spark: SparkSession,
    input_dir: str,
):
    """Custom stateful operator: running per-conversation counters.

    ``applyInPandasWithState`` keeps (n_turns, n_chars, max_turn_idx) per
    conv_id across micro-batches -- the streaming analogue of an incremental
    per-entity accumulator (e.g. live transcript ingestion keyed by
    conversation). Returns the unstarted streaming DataFrame; attach a sink
    with outputMode('update'). Note: restarting from a checkpoint requires a
    fault-tolerant sink (foreachBatch/parquet) -- Spark's memory sink cannot
    recover a checkpointed query.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = read_transcripts_stream(spark, input_dir)

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        n_turns, n_chars, max_idx = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].str.len().sum())
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_chars, max_idx))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_chars": [n_chars],
                "max_turn_idx": [max_idx],
            }
        )

    return src.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType="conv_id string, n_turns long, n_chars long, max_turn_idx int",
        stateStructType="n_turns long, n_chars long, max_turn_idx int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
