"""Two-cluster-size scaling evidence (BASELINE.md §3).

No real multi-node cluster exists in this sandbox, so the north rule's
N vs 4N executor criterion is evidenced by running the SAME PageRank
superstep loop on the SAME persisted edge table at local[8] and
local[32] (shuffle partitions scaled 8 → 32), reporting throughput at
both plus efficiency = (throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md. Run: python scripts/scaling_bench.py
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cim_framework_graph_partitioning_spark.operators.edges import derive_edges
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank
from cim_framework_graph_partitioning_spark.session import get_spark
from cim_framework_graph_partitioning_spark.sources.corpus import synthesize_corpus

# large enough that per-superstep compute dominates fixed scheduling
# overhead (at 50k files a superstep is ~1s of pure overhead and MORE
# threads only add cost; at 1M files / ~8M edges compute dominates).
N_FILES = int(os.environ.get("SCALING_CORPUS_FILES", "4000000"))


def run_level(cores: int, edges_path: str, tol: float) -> dict:
    spark = get_spark(
        app_name=f"scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()
    # warm-up run (JIT + codegen cache + edge normalization) — the
    # measured quantity is STEADY-STATE superstep time (the loop runs
    # thousands of supersteps at production scale; one-time setup and
    # first-step compilation amortize to zero).
    pagerank(spark, edges, tol=0.0, max_iter=2)
    sink: list = []
    t0 = time.monotonic()
    _, steps = pagerank(
        spark, edges, tol=tol, max_iter=200, checkpoint_every=8,
        metrics_sink=sink,
    )
    elapsed = time.monotonic() - t0
    spark.stop()
    steady = [m["superstep_sec"] for m in sink[1:]] or [
        m["superstep_sec"] for m in sink
    ]
    sec_per_step = sum(steady) / len(steady)
    return {
        "cores": cores,
        "edges": n_edges,
        "supersteps": steps,
        "elapsed_sec": round(elapsed, 2),
        "sec_per_superstep": round(sec_per_step, 3),
        "edges_per_sec": round(n_edges / sec_per_step, 1),
    }


def main() -> None:
    # build the edge table once, persist to parquet, share across levels
    out = os.environ.get("SCALING_EDGES_PATH") or os.path.join(
        tempfile.gettempdir(), f"scaling_edges_{N_FILES}.parquet"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        spark = get_spark(app_name="scaling-prep", master="local[32]")
        files = synthesize_corpus(spark, n_files=N_FILES, n_repos=500, seed=42)
        g = derive_edges(files)
        g.edges.write.mode("overwrite").parquet(out)
        spark.stop()

    tol = float(os.environ.get("SCALING_TOL", "1e-6"))
    r8 = run_level(8, out, tol)
    r32 = run_level(32, out, tol)
    eff = (r32["edges_per_sec"] / r8["edges_per_sec"]) / 4.0

    today = datetime.date.today().isoformat()
    md = f"""# BENCH — measured baseline ({today})

## North-star: PageRank superstep throughput to {tol:g} convergence

Corpus: {N_FILES} synthesized files (seed 42), {r8["edges"]} derived
edges, identical parquet input for both parallelism levels (sandbox
stand-in for N vs 4N executor clusters per BASELINE.md §3).

| level | cores | supersteps | wall (s) | s/superstep | edges/sec |
|---|---|---|---|---|---|
| N  | 8  | {r8["supersteps"]} | {r8["elapsed_sec"]} | {r8["sec_per_superstep"]} | {r8["edges_per_sec"]:,.0f} |
| 4N | 32 | {r32["supersteps"]} | {r32["elapsed_sec"]} | {r32["sec_per_superstep"]} | {r32["edges_per_sec"]:,.0f} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(north-rule requirement: >= 0.80 — {"PASS" if eff >= 0.8 else "FAIL"}).

Caveat: local[k] scales threads in one JVM (shared memory bus, no
network shuffle); on a real cluster the same job shape shuffles only
the rank table per superstep (the normalized edge table is partitioned
once and cached), which is the property that makes the efficiency
transferable.

Raw JSON:
```json
{json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 4)})}
```
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
