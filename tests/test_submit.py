"""The north rule's literal launch shape: spark-submit --py-files on a
multi-executor (separate-JVM) master, verified against an in-process
run of the same operator."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_multi_executor_matches_in_process():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_smoke.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-1000:] + proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["master"].startswith("local-cluster")
    assert result["max_abs_diff_vs_inprocess"] < 1e-12
