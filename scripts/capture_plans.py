"""Capture .explain("formatted") for declared queries → plans/r06/.

Usage: python scripts/capture_plans.py <suffix> <out_dir> [sf_dir] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (all registered
queries when none are named). Iterative queries execute their fixpoint
loops while the query function builds its result, so the captured plan
is the final projection; the per-superstep plan shape is documented by
scripts/step_plans.py instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cim_framework_graph_partitioning_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
