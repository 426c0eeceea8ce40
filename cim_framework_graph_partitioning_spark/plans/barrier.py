"""Plan barrier: bounded truncation for iterative DataFrame loops.

Measured in this environment (PySpark 4.1.2, local mode): chained
``localCheckpoint(eager=True)`` — and even reliable
``checkpoint(eager=True)`` — keep the LOGICAL plan flat but never
truncate the physical RDD ancestry. A superstep that references its
previous state twice therefore builds a dependency graph that doubles
every step, and the per-step checkpoint cost explodes ~2-3x/step once
the graph is large enough (~20 chained checkpoints: 0.7s → 195s/step).
A parquet write + re-read is the only reliable hard barrier (constant
0.3s/step over 40+ steps on tmpfs).

``PlanBarrier.cut(df)`` is the loop-side answer:

* most steps: ``localCheckpoint(eager=True)`` — cheap, keeps the
  logical plan flat so Catalyst analysis stays O(1) per step;
* every ``hard_every``-th cut: parquet round-trip to a session-scoped
  scratch dir (alternating two paths, so disk use is bounded), which
  resets the RDD ancestry before the walk cost is measurable
  (2^8 = 256 nodes at the default cadence).

On a real cluster the hard barrier lands on the executors' local dirs /
HDFS checkpoint dir — the same cadence logic applies; the durable
SuperstepRunner checkpoints (which are already parquet round-trips)
count as hard barriers for free.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def checkpoint_leaf_ids(df: DataFrame | None) -> frozenset[int]:
    """RDD ids of the LogicalRDD leaves in ``df``'s analyzed plan.

    Used to mark checkpoints a loop does NOT own (the caller's input
    may itself be a localCheckpoint'ed frame) so ``release_checkpoint``
    skips them — releasing an ancestor checkpoint mid-loop truncated
    lineage that later supersteps still needed
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; hit by near_dup_clusters whose
    materialized pair graph feeds the CC fixpoint)."""
    ids: set[int] = set()
    if df is None:
        return frozenset()
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves()  # allow-jvm-handle: py4j walk of the analyzed plan, not the Python RDD API
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                ids.add(leaf.rdd().id())  # allow-jvm-handle: py4j accessor on the JVM plan leaf, not the Python RDD API
    except Exception:
        pass
    return frozenset(ids)


def release_checkpoint(
    df: DataFrame | None, protect: frozenset[int] = frozenset()
) -> None:
    """Explicitly unpersist the RDD(s) behind a localCheckpoint'ed frame.

    ``Dataset.localCheckpoint`` registers its materialized RDD in the
    SparkContext's persistentRdds map and nothing ever removes it (the
    DataFrame reports is_cached=False, so unpersist() paths skip it).
    Combined with the untruncated-ancestry build bug, every superseded
    checkpoint pins its whole dependency graph in the driver heap —
    measured: the 2nd and 3rd identical PageRank runs in one session
    were 2x slower with multi-second GC stalls until this release.

    Walks ALL leaves of the analyzed plan, not just a top-level
    LogicalRDD: a state frame is often a Project/Filter OVER the
    checkpointed LogicalRDD (e.g. pagerank returns
    ``newc.select("id", "rank", "has_out")``), and matching only the
    root silently skipped the release for exactly those frames.

    ``protect`` lists RDD ids the caller does NOT own (see
    ``checkpoint_leaf_ids``); those leaves are left pinned."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves()  # allow-jvm-handle: py4j walk of the analyzed plan, not the Python RDD API
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                rdd = leaf.rdd()  # allow-jvm-handle: py4j accessor on the JVM plan leaf, not the Python RDD API
                if rdd.id() not in protect:
                    rdd.unpersist(False)
    except Exception:
        pass  # non-checkpointed frame or internal API drift — harmless


def _scratch_root(spark: SparkSession) -> str:
    base = spark.conf.get("spark.local.dir", None) or tempfile.gettempdir()
    first = base.split(",")[0]
    return first if os.path.isdir(first) and os.access(first, os.W_OK) else tempfile.gettempdir()


class PlanBarrier:
    def __init__(
        self,
        spark: SparkSession,
        hard_every: int = 8,
        tag: str = "loop",
    ) -> None:
        self.spark = spark
        self.hard_every = max(1, hard_every)
        self._n = 0
        self._dir: str | None = None
        self._tag = tag
        self._prev: DataFrame | None = None

    def _paths(self) -> str:
        if self._dir is None:
            root = _scratch_root(self.spark)
            self._dir = os.path.join(
                root, f"plan_barrier_{self._tag}_{uuid.uuid4().hex[:12]}"
            )
            atexit.register(shutil.rmtree, self._dir, ignore_errors=True)
        return os.path.join(self._dir, f"slot{self._n // self.hard_every % 2}")

    def cut(self, df: DataFrame, hard: bool | None = None) -> DataFrame:
        """Truncate ``df``'s plan. Soft (localCheckpoint) on most calls,
        hard (parquet round-trip) every ``hard_every``-th call or when
        ``hard=True``. The returned frame is materialized either way;
        the PREVIOUS cut's checkpoint RDD is released (superseded)."""
        self._n += 1
        if hard is None:
            hard = self._n % self.hard_every == 0
        if hard:
            path = self._paths()
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            if df.is_cached:
                df.unpersist()
        else:
            out = df.localCheckpoint(eager=True)
        release_checkpoint(self._prev)
        self._prev = out if not hard else None
        return out

    def mark_hard(self) -> None:
        """Record an externally-performed hard barrier (e.g. the runner's
        durable parquet checkpoint), resetting the soft-cut budget."""
        self._n = 0
