"""Shared scaling-edge-table builder for the bench scripts.

roofline.py, csr_crossover.py, and scaling_bench.py all measure over
the same on-disk artifact (/tmp/scaling_edges_{n}.parquet). The recipe
lives HERE, once, so a parameter change cannot leave one script
silently reusing a parquet built by another script's stale recipe.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def edge_table(n_files: int, cores: int = 32) -> str:
    """Synthesize (once) and return the path of the scaling edge table
    for ``n_files`` corpus files: seed 42, 500 repos — the workload
    every published scaling/crossover/roofline number refers to."""
    out = os.path.join(tempfile.gettempdir(), f"scaling_edges_{n_files}.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from cim_framework_graph_partitioning_spark.operators.edges import derive_edges
        from cim_framework_graph_partitioning_spark.session import get_spark
        from cim_framework_graph_partitioning_spark.sources.corpus import (
            synthesize_corpus,
        )

        spark = get_spark(app_name="scaling-prep", master=f"local[{cores}]")
        files = synthesize_corpus(spark, n_files=n_files, n_repos=500, seed=42)
        derive_edges(files).edges.write.mode("overwrite").parquet(out)
        spark.stop()
    return out
