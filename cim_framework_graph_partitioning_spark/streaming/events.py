"""Streaming ingestion of the events table: watermarked tumbling-window
aggregation, batch-equivalent by construction.

The reference has no streaming surface (verified, SURVEY §2.2); this is
the engine's Structured Streaming path so the same windowed aggregation
can run over a live source. Tested by driving a parquet-backed stream to
completion and comparing to the batch plan on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type. Works identically on
    a batch DataFrame (no watermark applied) and a streaming one."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_events_from_dir(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a directory of events parquet."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(dir_path)
    )


def run_stream_to_memory(spark: SparkSession, dir_path: str,
                         query_name: str = "events_windowed") -> DataFrame:
    """Drive the stream to completion synchronously (test/smoke path);
    returns the materialized result table."""
    agg = windowed_counts(stream_events_from_dir(spark, dir_path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
