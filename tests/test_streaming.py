"""Structured Streaming: file-source ingest -> postings sink, resume, stats."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blurrily_spark.operators.find import find_one
from blurrily_spark.plans.pipeline import build_turns, turns_to_postings
from blurrily_spark.sources.synth import generate_transcripts
from blurrily_spark.streaming.stream import stream_index_build, stream_turn_stats


def _land(df, path):
    df.write.mode("append").parquet(path)


def test_stream_index_build_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = generate_transcripts(spark, n_entities=4, variants_per_entity=2,
                                  turns_per_conv=2, seed=5)
    _land(batch1, src)

    q = stream_index_build(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = turns_to_postings(build_turns(spark.read.parquet(src)))
    assert got.count() == expected.count()
    # streamed index answers FIND like a batch-built one
    needle = batch1.select("text").first()["text"]
    assert find_one(got, needle).count() > 0


def test_stream_resume_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _land(generate_transcripts(spark, n_entities=3, seed=1), src)
    q = stream_index_build(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # second batch (disjoint entity ids) lands; restart from checkpoint
    # processes ONLY the new files
    _land(generate_transcripts(spark, n_entities=3, seed=2, entity_offset=100), src)
    q2 = stream_index_build(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1
    # exactly-once: total equals a fresh batch run over everything
    expected = turns_to_postings(build_turns(spark.read.parquet(src))).count()
    assert n2 == expected


def test_stream_dup_ref_is_noop(spark, tmp_path):
    """W1 semantics in the streaming path: a turn re-sent in a later file
    adds ZERO postings (storage.c:408; map_spec.rb:61-67). A plain append
    sink would double-insert and inflate FIND match counts."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = generate_transcripts(spark, n_entities=3, seed=4)
    _land(batch1, src)
    q = stream_index_build(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # the SAME turns land again (new files, same conv_id/turn_idx => same
    # refs) plus one genuinely new conversation set
    _land(batch1, src)
    batch2 = generate_transcripts(spark, n_entities=2, seed=11, entity_offset=500)
    _land(batch2, src)
    q2 = stream_index_build(spark, src, out, ckpt, available_now=True)
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    expected_new = turns_to_postings(build_turns(batch2)).count()
    assert got.count() == n1 + expected_new  # re-sent refs added nothing
    # and every ref appears with a single posting set (no duplicates)
    dup_postings = (
        got.groupBy("ref", "trigram").count().where(F.col("count") > 1).count()
    )
    assert dup_postings == 0


def test_stream_minhash_dedup_incremental(spark, tmp_path):
    """Streaming near-dup detection: each batch dedups against the whole
    history; re-running with a second batch emits ONLY new pairs (history x
    history never re-joins), and cross-batch near-dups are found."""
    from blurrily_spark.streaming.stream import stream_minhash_dedup

    src = str(tmp_path / "in")
    sigs = str(tmp_path / "sigs")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    batch1 = generate_transcripts(spark, n_entities=3, variants_per_entity=2,
                                  turns_per_conv=3, n_perturbations=1, seed=3)
    _land(batch1, src)
    q = stream_minhash_dedup(spark, src, sigs, pairs, ckpt,
                             available_now=True, threshold=0.4)
    q.awaitTermination(120)
    p1 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs).collect()}
    assert p1, "variant turns within batch 1 must collide"
    n_sigs1 = spark.read.parquet(sigs).count()

    # batch 2: new entities whose texts are near-dups ACROSS batches
    # (variant 0 of each entity is the pristine template, so re-generating
    # the same entities under a new id offset is not possible; instead we
    # re-send entity texts with extra variants -- same conv templates,
    # different variant ids => new refs, near-dup texts)
    batch2 = generate_transcripts(spark, n_entities=3, variants_per_entity=4,
                                  turns_per_conv=3, n_perturbations=1, seed=3)
    batch2 = batch2.where(~batch2.conv_id.endswith("_v00") & ~batch2.conv_id.endswith("_v01"))
    _land(batch2, src)
    q2 = stream_minhash_dedup(spark, src, sigs, pairs, ckpt,
                              available_now=True, threshold=0.4)
    q2.awaitTermination(120)

    all_pairs = [(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs).collect()]
    assert len(all_pairs) == len(set(all_pairs)), "no pair emitted twice"
    new_pairs = set(all_pairs) - p1
    assert new_pairs, "cross-batch near-dups must be detected"
    assert spark.read.parquet(sigs).count() > n_sigs1
    # every batch-1 pair is still exactly once (append-only, no re-emit)
    assert p1 <= set(all_pairs)


def test_stream_turn_stats_memory_sink(spark, tmp_path):
    src = str(tmp_path / "in")
    _land(generate_transcripts(spark, n_entities=4, seed=9), src)
    agg = stream_turn_stats(spark, src, window="5 minutes", watermark="1 minute")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("turn_stats").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM turn_stats").collect()
    assert rows
    assert {r["role"] for r in rows} <= {"user", "assistant", "tool"}
    assert sum(r["turns"] for r in rows) == spark.read.parquet(src).count()


def test_stateful_conversation_progress(spark, tmp_path):
    from blurrily_spark.streaming.stream import stream_conversation_progress

    src = str(tmp_path / "in")
    t = generate_transcripts(spark, n_entities=3, variants_per_entity=2,
                             turns_per_conv=4, seed=6)
    _land(t, src)
    agg = stream_conversation_progress(spark, src)
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("conv_progress").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["conv_id"]: (r["n_turns"], r["max_turn_idx"])
           for r in spark.sql("SELECT * FROM conv_progress").collect()}
    expected = {r["conv_id"]: r["n"] for r in
                t.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()}
    assert set(got) == set(expected)
    for conv, n in expected.items():
        assert got[conv] == (n, n - 1)
