from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.streaming.events import (
    EVENTS_SCHEMA,
    run_stream_to_memory,
    sessionized_counts,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def _time_ordered_chunks(batch, n_chunks=3):
    """Split events into n_chunks time-ordered row lists (for replaying
    in event-time order across micro-batches — exercises cross-batch
    state carryover)."""
    rows = batch.orderBy("ts", "event_id").collect()
    step = (len(rows) + n_chunks - 1) // n_chunks
    return [rows[i * step : (i + 1) * step] for i in range(n_chunks)]


def _write_chunk_file(spark, chunk, dest, i):
    path = os.path.join(dest, f"chunk_{i:02d}.parquet")
    d = path + ".dir"
    spark.createDataFrame(chunk, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    os.rename(os.path.join(d, part), path)
    shutil.rmtree(d)


def test_stream_equals_batch(spark, tmp_path):
    # stage the events parquet into a stream-source dir
    src_dir = str(tmp_path / "events_stream")
    batch = spark.read.parquet(f"{SF}/events.parquet")
    batch.write.mode("overwrite").parquet(src_dir)
    shutil.rmtree(f"{src_dir}/_spark_metadata", ignore_errors=True)

    streamed = run_stream_to_memory(spark, src_dir, query_name="t_ev")
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts(batch).collect()
    }
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in streamed.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_sessionization_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization carried across micro-batches
    must equal the batch window-lag sessionization on the same events."""
    from cim_framework_graph_partitioning_spark.queries import q_events_sessions

    batch = spark.read.parquet(f"{SF}/events.parquet")
    src_dir = str(tmp_path / "ev_state")
    os.makedirs(src_dir)
    chunks = _time_ordered_chunks(batch, n_chunks=3)
    _write_chunk_file(spark, chunks[0], src_dir, 0)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(src_dir)
    )
    q = (
        sessionized_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sess")
        .start()
    )
    try:
        # drain between drops → deterministic event-time batch order
        q.processAllAvailable()
        for i, chunk in enumerate(chunks[1:], start=1):
            _write_chunk_file(spark, chunk, src_dir, i)
            q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per user per touched batch; the running
    # total is non-decreasing, so max = final (order-insensitive).
    mem = spark.sql("SELECT user_id, max(n_sessions) AS n_sessions FROM t_sess GROUP BY 1")
    got = {r.user_id: r.n_sessions for r in mem.collect()}
    want = {
        r.user_id: r.n_sessions for r in q_events_sessions(spark, SF).collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 2h watermark: an event arriving
    3h late (behind the advanced watermark) must NOT appear."""
    import datetime as dt

    def ev(i, ts, etype, val):
        return (i, dt.datetime(2024, 1, 1, *ts), 1, etype, float(val), "{}")

    on_time = [ev(1, (0, 10), "a", 1), ev(2, (1, 0), "a", 1)]
    advance = [ev(3, (9, 0), "a", 1)]  # pushes watermark to 07:00
    late = [ev(4, (2, 30), "late", 99)]  # 02:30 < watermark 07:00 → dropped
    src = str(tmp_path / "late_ev")
    os.makedirs(src)

    def add_file(i, chunk):
        df = spark.createDataFrame(chunk, EVENTS_SCHEMA).coalesce(1)
        d = f"{src}/c{i}.dir"
        df.write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, part), f"{src}/chunk_{i:02d}.parquet")
        shutil.rmtree(d)

    add_file(0, on_time)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(src)
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        # drain between file drops → guaranteed batch separation, so the
        # watermark advances past 07:00 BEFORE the late event arrives.
        q.processAllAvailable()
        add_file(1, advance)
        q.processAllAvailable()
        add_file(2, late)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_late").collect()
    types = {r.event_type for r in rows}
    assert "a" in types  # finalized on-time windows emitted
    assert "late" not in types  # late event dropped by the watermark


def test_session_kernel_chunk_order_insensitive():
    """applyInPandasWithState guarantees NO row ordering across a group's
    Arrow chunks; the kernel must produce identical session counts for
    any chunking/ordering of the same micro-batch, and late cross-batch
    events must never open or inflate sessions (r2 ADVICE)."""
    import pandas as pd

    from cim_framework_graph_partitioning_spark.streaming.events import (
        _session_kernel,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    def run(chunk_lists):
        """chunk_lists: list of micro-batches, each a list of ts-second
        lists (chunks). Returns final n_sessions."""
        fn = _session_kernel(gap_sec=1800)
        state = FakeState()
        out = None
        for chunks in chunk_lists:
            pdfs = [
                pd.DataFrame({"ts": pd.to_datetime(c, unit="s")}) for c in chunks
            ]
            out = list(fn((7,), iter(pdfs), state))[0]
        return int(out["n_sessions"].iloc[0])

    h = 3600
    # two true sessions: [0, 600, 1200] and [3*h, 3*h+60]
    events = [0, 600, 1200, 3 * h, 3 * h + 60]
    want = 2
    # one sorted chunk
    assert run([[events]]) == want
    # adversarial: two chunks, later events in the FIRST chunk
    assert run([[[3 * h, 3 * h + 60], [0, 600, 1200]]]) == want
    # adversarial: interleaved unsorted chunks
    assert run([[[1200, 3 * h + 60], [3 * h, 0, 600]]]) == want
    # across micro-batches in order
    assert run([[[0, 600, 1200]], [[3 * h, 3 * h + 60]]]) == want
    # late cross-batch event (ts before state last_ts): documented
    # conservative semantics — absorbed into the current session (never
    # opens one retroactively), and it must not inflate its successor's
    # gap: 3h+60 is 60s after last_ts=3h, so still session #1.
    assert run([[[3 * h]], [[0, 3 * h + 60]]]) == 1
    # a genuinely new session after late data still opens
    assert run([[[3 * h]], [[0, 6 * h]]]) == 2
