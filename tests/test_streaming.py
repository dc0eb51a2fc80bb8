"""Structured Streaming tests: watermarked rollup equivalence with the
batch twin, and micro-batch KG construction MERGE-committing into the
parquet store idempotently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontograph_spark.pipeline.construct import construct_kg
from ontograph_spark.pipeline.repo_source import REPO_SCHEMA, synthesize_repo_table
from ontograph_spark.store import ParquetQuadStore
from ontograph_spark.streaming.stream_ingest import (
    hourly_event_rollup,
    stream_construct_kg,
    stream_user_sessions,
)

GRAPH = "https://ontograph.dev/stream-kg"


def test_hourly_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        hourly_event_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["hour"]), r["event_type"], r["n"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
    )
    want = {
        (str(r["hour"]), r["event_type"], r["n"], r["sum_value_cents"])
        for r in batch.collect()
    }
    assert got == want


def test_stateful_sessions_match_batch_across_microbatches(spark, tmp_path):
    """applyInPandasWithState sessionization: split the events at the
    median timestamp into two files → two micro-batches; a session
    spanning the boundary must be counted ONCE (state carries last_ts),
    and final totals must equal the batch lag-window sessionization."""
    import time as _time

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    epoch = F.col("ts").cast("timestamp").cast("double")  # NTZ → ts → secs
    cut = ev.select(
        F.expr("percentile_approx(CAST(CAST(ts AS TIMESTAMP) AS DOUBLE), 0.5)").alias("c")
    ).collect()[0]["c"]
    src = str(tmp_path / "ev_batches")
    ev.where(epoch <= cut).coalesce(1).write.parquet(src)
    _time.sleep(1.1)  # distinct mtimes → deterministic file-source order
    ev.where(epoch > cut).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream_user_sessions(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            # n_events is monotonic per user → max row = latest state
            "SELECT user_id, max_by(n_sessions, n_events) AS n_sessions, "
            "max(n_events) AS n_events FROM sessions_test GROUP BY user_id"
        ).collect()
    }

    import __spark_entry__ as entrymod

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in entrymod.q_user_sessions(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


def test_stream_exact_dedup_across_microbatches(spark, tmp_path):
    """Exact streaming dedup: duplicates arriving in a LATER micro-batch
    (within the watermark) are dropped — the fingerprint set of the
    streamed output equals the batch-distinct set, and re-arrivals don't
    re-emit."""
    import time as _time

    from ontograph_spark.functions.text import fingerprint
    from ontograph_spark.streaming.stream_ingest import stream_exact_dedup

    rows1 = [(0, "alpha beta gamma", "2024-01-01 10:00:00"),
             (1, "delta epsilon", "2024-01-01 10:01:00"),
             (2, "alpha  beta   GAMMA", "2024-01-01 10:02:00")]  # dup of 0
    rows2 = [(3, "alpha beta gamma", "2024-01-01 10:10:00"),      # dup of 0
             (4, "zeta eta", "2024-01-01 10:11:00"),
             (5, "delta epsilon", "2024-01-01 10:12:00")]         # dup of 1
    schema = "doc_id long, text string, ts string"
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src)
    _time.sleep(1.1)  # distinct mtimes → deterministic file order
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test")
    got_fps = [r[0] for r in got.select(fingerprint("text")).collect()]
    assert sorted(got_fps) == sorted(set(got_fps))  # no fingerprint twice
    batch_fps = {
        r[0]
        for r in spark.read.parquet(src).select(fingerprint("text")).collect()
    }
    assert set(got_fps) == batch_fps  # every distinct content survived
    # 3 distinct contents: docs 0/2/3 normalize identically, 1/5 likewise
    assert got.count() == 3


def test_stream_construct_merges_into_store(spark, tmp_path):
    src = str(tmp_path / "repo_rows")
    synthesize_repo_table(spark, 80, partitions=2).write.parquet(src)
    store = ParquetQuadStore(spark, GRAPH, str(tmp_path / "quads"), write_partitions=2)

    stream = spark.readStream.schema(REPO_SCHEMA).parquet(src)
    q = stream_construct_kg(
        stream, store, str(tmp_path / "ckpt"), GRAPH, trigger_once=True
    )
    q.awaitTermination(180)

    batch_quads = construct_kg(spark, spark.read.parquet(src), GRAPH)
    want = batch_quads.count()
    assert store.size() == want

    # replaying the same input is a no-op (MERGE keyed on the full quad)
    stream2 = spark.readStream.schema(REPO_SCHEMA).parquet(src)
    q2 = stream_construct_kg(
        stream2, store, str(tmp_path / "ckpt2"), GRAPH, trigger_once=True
    )
    q2.awaitTermination(180)
    assert store.size() == want


def test_stream_construct_maintains_closure(spark, tmp_path):
    """Streaming KG construction with incrementally-maintained
    entailment: after two micro-batch rounds, the closure store equals
    a from-scratch rdfs_closure of the full base store."""
    from ontograph_spark.ontology.inference import rdfs_closure
    from ontograph_spark.streaming.stream_ingest import (
        stream_construct_kg_with_closure,
    )

    src1 = str(tmp_path / "rows1")
    src2 = str(tmp_path / "rows2")
    all_rows = synthesize_repo_table(spark, 60, partitions=2)
    all_rows.limit(40).write.parquet(src1)
    all_rows.subtract(all_rows.limit(40)).write.parquet(src2)
    store = ParquetQuadStore(
        spark, GRAPH, str(tmp_path / "base"), write_partitions=2
    )
    closure_store = ParquetQuadStore(
        spark, GRAPH, str(tmp_path / "closure"), write_partitions=2
    )

    # round 1: seeds the full closure (schema arrives in batch 0)
    s1 = spark.readStream.schema(REPO_SCHEMA).parquet(src1)
    stream_construct_kg_with_closure(
        s1, store, closure_store, str(tmp_path / "c1"), GRAPH
    ).awaitTermination(240)
    n1 = closure_store.size()
    assert n1 > store.size() * 0  # non-empty
    # round 2: new files arrive — delta maintenance path
    s2 = spark.readStream.schema(REPO_SCHEMA).parquet(src2)
    stream_construct_kg_with_closure(
        s2, store, closure_store, str(tmp_path / "c2"), GRAPH
    ).awaitTermination(240)

    want = {
        tuple(r)
        for r in rdfs_closure(store.df()).collect()
    }
    got = {
        tuple(r)
        for r in closure_store.df().select("subj", "pred", "obj").collect()
    }
    assert got == want
    assert len(got) >= n1
