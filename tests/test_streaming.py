from __future__ import annotations

import shutil

from cim_framework_graph_partitioning_spark.streaming.events import (
    run_stream_to_memory,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


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
