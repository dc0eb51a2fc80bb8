"""Structured Streaming surfaces.

The reference has no streaming layer (SURVEY.md §2.4); the north rule's
resumability requirement is met by the batch MERGE + per-partition
manifests in pipeline/materialize.py. These streaming operators are the
*engine extension* for continuously-arriving inputs:

* :func:`stream_construct_kg` — micro-batch KG construction: a streaming
  source of repo-table rows is run through the same ``construct_kg`` plan
  per micro-batch via ``foreachBatch`` and MERGE-committed into a
  ``ParquetQuadStore`` — idempotent under replays because the merge is
  keyed on the full quad (exactly-once *effect* on top of Spark's
  at-least-once restart semantics, the standard foreachBatch discipline).
* :func:`hourly_event_rollup` — watermarked windowed aggregation over an
  event stream (late data tolerated up to the watermark), the streaming
  twin of the batch ``events_hourly`` query in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ontograph_spark.pipeline.construct import DEFAULT_GRAPH, construct_kg
from ontograph_spark.store.parquet_store import ParquetQuadStore


def stream_construct_kg(
    files_stream: DataFrame,
    store: ParquetQuadStore,
    checkpoint_dir: str,
    graph_uri: str = DEFAULT_GRAPH,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Run KG construction per micro-batch and MERGE into the store."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        quads = construct_kg(
            batch_df.sparkSession, batch_df, graph_uri, include_schema=(batch_id == 0)
        )
        store.merge_df(quads)

    writer = (
        files_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_event_rollup(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked hourly rollup: late events beyond the watermark are
    dropped; state is bounded by the watermark horizon."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )
