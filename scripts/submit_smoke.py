"""spark-submit --py-files smoke: the north rule's literal launch shape.

Zips the package, then launches ``main.py`` through the REAL
``spark-submit`` binary with ``--py-files`` against a MULTI-EXECUTOR
master (``local-cluster[2,2,4096]`` — two separate executor JVM
processes), runs PageRank on a small parquet edge table, and verifies
the written ranks against an in-process run of the same operator
(allclose 1e-12 — the north rule's per-vertex score criterion, at a
tolerance far stricter than its 1e-6).

Run: python scripts/submit_smoke.py
Prints one JSON line {"ok": true, ...} on success; exits non-zero on
any mismatch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                            "spark-submit")


def main() -> int:
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    work = tempfile.mkdtemp(prefix="submit_smoke_")

    # 1. package zip for --py-files
    pkg_zip = os.path.join(work, "pkg.zip")
    pkg_dir = os.path.join(REPO, "cim_framework_graph_partitioning_spark")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, _dirs, names in os.walk(pkg_dir):
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(root, n)
                    z.write(full, os.path.relpath(full, REPO))

    # 2. small deterministic edge table + reference ranks, in-process
    from cim_framework_graph_partitioning_spark.operators.pagerank import (
        pagerank,
    )
    from cim_framework_graph_partitioning_spark.session import get_spark

    edges_path = os.path.join(work, "edges.parquet")
    out_path = os.path.join(work, "ranks.parquet")
    spark = get_spark(app_name="submit-smoke-ref", master="local[4]",
                      shuffle_partitions=8)
    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 97, 1.0 + i % 3) for i in range(2000)],
        "src_id long, dst_id long, weight double",
    )
    edges.write.mode("overwrite").parquet(edges_path)
    want, want_steps = pagerank(spark, spark.read.parquet(edges_path),
                                tol=1e-8, max_iter=100)
    want_rows = {r.id: r.rank for r in want.collect()}
    spark.stop()

    # 3. the real spark-submit --py-files against a multi-executor master
    cmd = [
        SPARK_SUBMIT,
        "--master", "local-cluster[2,2,4096]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.host=127.0.0.1",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", pkg_zip,
        os.path.join(REPO, "main.py"),
        "--algo", "pagerank",
        "--input", edges_path,
        "--output", out_path,
        "--tol", "1e-8",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        print(json.dumps({"ok": False, "stage": "spark-submit",
                          "rc": proc.returncode}))
        return 1

    # 4. compare the written ranks against the in-process reference
    import duckdb

    got_rows = {
        int(i): float(r)
        for i, r in duckdb.sql(
            f"SELECT id, rank FROM '{out_path}/*.parquet'"
        ).fetchall()
    }
    same_ids = set(got_rows) == set(want_rows)
    max_diff = max(
        abs(got_rows[k] - want_rows[k]) for k in want_rows
    ) if same_ids else float("inf")
    ok = same_ids and max_diff < 1e-12
    print(json.dumps({
        "ok": ok,
        "master": "local-cluster[2,2,4096]",
        "py_files": os.path.basename(pkg_zip),
        "vertices": len(want_rows),
        "ref_supersteps": want_steps,
        "max_abs_diff_vs_inprocess": max_diff,
        "rank_sum": round(sum(got_rows.values()), 12) if got_rows else None,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
