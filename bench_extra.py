"""Round-6 auxiliary benchmarks (bench.py is FROZEN; extra evidence
lives here per the optimization-round contract).

Two measurements, printed as one JSON line each:

1. job-counts: Spark jobs executed per operator call (statusTracker over
   a per-call job group) for the iterative operators — the direct
   evidence for the r6 "one job per superstep" fusion claims. Reported
   as total jobs and jobs/superstep alongside the superstep count.
2. noop-sink timings (guide §1.4) for the one-shot declared queries the
   frozen bench times via .collect(): write.format("noop") computes
   every column of every row without sink cost.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cim_framework_graph_partitioning_spark.operators.components import (  # noqa: E402
    connected_components,
)
from cim_framework_graph_partitioning_spark.operators.edges import derive_edges  # noqa: E402
from cim_framework_graph_partitioning_spark.operators.hits import hits  # noqa: E402
from cim_framework_graph_partitioning_spark.operators.kcore import coreness  # noqa: E402
from cim_framework_graph_partitioning_spark.operators.labelprop import (  # noqa: E402
    label_propagation,
)
from cim_framework_graph_partitioning_spark.operators.mis import (  # noqa: E402
    maximal_independent_set,
)
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank  # noqa: E402
from cim_framework_graph_partitioning_spark.queries import (  # noqa: E402
    q_embedding_topk,
    q_events_sessions,
    q_pricing_summary,
    q_top_customers,
    q_top_depended_parts,
)
from cim_framework_graph_partitioning_spark.session import get_spark  # noqa: E402
from cim_framework_graph_partitioning_spark.sources.corpus import synthesize_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sc = spark.sparkContext

    files = synthesize_corpus(spark, n_files=20000, n_repos=200, seed=42)
    edges = derive_edges(files).edges.persist()
    edges.count()

    def count_jobs(name, fn):
        """Run fn under a job group; report jobs executed + steps."""
        sc.setJobGroup(name, name)
        try:
            steps = fn()
        finally:
            sc.setJobGroup(None, None)  # type: ignore[arg-type]
        jobs = len(sc.statusTracker().getJobIdsForGroup(name))
        return {"jobs": jobs, "steps": steps,
                "jobs_per_step": round(jobs / steps, 2) if steps else None}

    jc = {
        "pagerank": count_jobs(
            "jc_pagerank",
            lambda: pagerank(spark, edges, tol=1e-6, max_iter=200,
                             checkpoint_every=8)[1],
        ),
        "cc_star": count_jobs(
            "jc_cc", lambda: connected_components(spark, edges)[1]
        ),
        "lpa_5": count_jobs(
            "jc_lpa", lambda: label_propagation(spark, edges, max_iter=5)[1]
        ),
        "hits": count_jobs(
            "jc_hits", lambda: hits(spark, edges, tol=1e-6, max_iter=100)[1]
        ),
        "kcore": count_jobs("jc_kcore", lambda: coreness(spark, edges)[1]),
        "mis": count_jobs(
            "jc_mis", lambda: maximal_independent_set(spark, edges)[1]
        ),
    }
    print(json.dumps({"metric": "jobs_per_operator", "sf_dir": sf_dir, **jc}))

    # noop-sink isolation for the one-shot declared queries (guide §1.4)
    one_shots = {
        "top_depended_parts": q_top_depended_parts,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "events_sessions": q_events_sessions,
        "embedding_topk": q_embedding_topk,
    }
    noop: dict[str, float] = {}
    for name, fn in one_shots.items():
        best = None
        for _ in range(2):
            sc.setJobDescription(f"noop:{name}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        noop[name] = best
    print(json.dumps({"metric": "noop_sink_best_sec", "queries": noop}))
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
