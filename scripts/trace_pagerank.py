"""Trace the dataframe-PageRank bench query per superstep.

Reproduces bench.py's `pagerank_corpus_1e6` entry exactly (same corpus,
same settings) and prints the per-superstep seconds array so warm-up vs
steady state is auditable (VERDICT r2 #1).

Usage: python scripts/trace_pagerank.py [--runs N] [--mode dataframe|csr]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cim_framework_graph_partitioning_spark.operators.edges import derive_edges  # noqa: E402
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank  # noqa: E402
from cim_framework_graph_partitioning_spark.session import get_spark  # noqa: E402
from cim_framework_graph_partitioning_spark.sources.corpus import synthesize_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--mode", default="dataframe")
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra runtime spark confs key=value")
    ap.add_argument("--prewarm", type=int, default=0,
                    help="run a tiny pagerank of N synthetic edges first")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="trace_pagerank", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    files = synthesize_corpus(spark, n_files=args.files, n_repos=200, seed=42)
    g = derive_edges(files)
    edges = g.edges.persist()
    t0 = time.monotonic()
    n_edges = edges.count()
    print(f"derive_edges: {time.monotonic()-t0:.1f}s  edges={n_edges}", flush=True)

    if args.prewarm:
        from pyspark.sql import functions as F
        t0 = time.monotonic()
        tiny = spark.range(args.prewarm).select(
            (F.col("id") % 997).alias("src_id"),
            ((F.col("id") * 7 + 1) % 997).alias("dst_id"),
            F.lit(1.0).alias("weight"),
        )
        pagerank(spark, tiny, tol=0.0, max_iter=3, checkpoint_every=8)
        print(f"prewarm({args.prewarm} edges, 3 steps): "
              f"{time.monotonic()-t0:.1f}s", flush=True)

    for run in range(args.runs):
        sink: list = []
        t0 = time.monotonic()
        _, steps = pagerank(spark, edges, tol=1e-6, max_iter=200,
                            mode=args.mode, checkpoint_every=8,
                            metrics_sink=sink)
        total = time.monotonic() - t0
        per_step = [m["superstep_sec"] for m in sink]
        print(json.dumps({
            "run": run, "mode": args.mode, "total_sec": round(total, 2),
            "steps": steps, "per_step": per_step,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
