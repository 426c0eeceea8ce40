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


def sessionized_counts(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: per-user session counting via
    ``applyInPandasWithState`` (a gap > gap_sec between consecutive
    events opens a new session — identical semantics to the batch
    ``q_events_sessions`` query, so stream ≡ batch is testable).

    State per user = (last_ts epoch seconds, sessions so far); each
    micro-batch updates it with numpy-vectorized gap counting (no
    per-row Python) and emits the running total. Output mode: update.

    Ordering semantics (explicit): ``applyInPandasWithState`` gives NO
    ordering guarantee for a group's rows ACROSS Arrow chunks, so all
    chunks of the micro-batch are concatenated and sorted ONCE before
    gap computation (sorting each chunk independently and folding them
    in arrival order would see phantom negative gaps at chunk
    boundaries and silently mis-count sessions). ACROSS micro-batches
    the state carries last_ts; an event arriving in a later batch with
    ts <= last_ts (late data) yields a non-positive gap and is counted
    as in-session — never a new session, never a retroactive merge of
    two already-counted sessions. Pair with an upstream watermark to
    bound how late such events can be; within-watermark replays are
    therefore order-insensitive per batch and conservatively
    session-merged across batches.
    """
    out_schema = "user_id long, n_sessions long"
    state_schema = "last_ts double, n long"
    fn = _session_kernel(gap_sec)

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", "NoTimeout"
    )


def _session_kernel(gap_sec: int):
    """Build the per-group stateful session-count kernel (module-level
    so tests can drive it with adversarial multi-chunk input that the
    file-source test harness cannot force)."""
    import numpy as np  # local: the kernel ships to workers
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            last_ts, n = state.get
        else:
            last_ts, n = float("nan"), 0
        # Concatenate ALL chunks, then sort once: chunk boundaries carry
        # no ordering guarantee (see sessionized_counts docstring).
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            ts = np.sort(
                np.concatenate(
                    [c["ts"].astype("int64").to_numpy() for c in chunks]
                )
            ) / 1e9
            prev = np.concatenate(([last_ts], ts[:-1]))
            if not np.isnan(last_ts):
                # a late event (ts <= state last_ts) sorts first and
                # would otherwise inflate its successor's gap; for gap
                # purposes no predecessor may lie before last_ts.
                prev = np.maximum(prev, last_ts)
            gaps = ts - prev
            # NaN prev (first-ever event) compares False; count it as a
            # session start explicitly.
            n += int(np.isnan(prev[0])) + int(np.nansum(gaps > gap_sec))
            # late cross-batch data (ts <= state last_ts) must not move
            # last_ts backwards
            last_ts = max(float(ts[-1]), last_ts) if not np.isnan(last_ts) \
                else float(ts[-1])
        state.update((last_ts, int(n)))
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [int(n)]})

    return fn


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
