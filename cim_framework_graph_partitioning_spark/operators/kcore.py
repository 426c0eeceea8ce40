"""K-core decomposition (per-vertex coreness) via h-index fixpoint.

The coreness of a vertex is the largest k such that it belongs to a
subgraph where every vertex has degree >= k. The classic peel is
inherently sequential; the distributed formulation (Lu, Zhang, Zhou
2016, "k-core decomposition on giraph-like systems") iterates the
h-operator instead:

    c_0(v)     = degree(v)
    c_{t+1}(v) = h-index of { c_t(u) : u is a neighbor of v }

which converges monotonically DOWN to the exact coreness. Every value
is an integer, so the DuckDB oracle replays bit-exactly with no
floating-point concerns, and over-unrolling the oracle past the
fixpoint is harmless (a fixpoint stays put).

h-index without an explicit sort-then-scan: with neighbor values
ranked descending, h = |{ rank r : value_r >= r }| — the qualifying
ranks form a prefix, so a windowed row_number + conditional count
computes it in one aggregation after the rank.

Scale shape:

* The undirected edge list is symmetrized + deduped once, cached
  hash-partitioned by dst_id: the per-step join (neighbor values onto
  edges) reuses that exchange and only the (vertex, value) table
  shuffles.
* The h-index window re-partitions the joined contributions by
  src_id — the second, unavoidable exchange per superstep (the
  h-operator genuinely needs each vertex's full neighbor multiset in
  one place; its sort is bounded by max degree).
* Convergence is a driver scalar: count of changed vertices == 0.
  Values only decrease, so the metric is monotone and the loop is
  resumable from any checkpointed state (SuperstepRunner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.scale import auto_blocks
from ..plans.superstep import SuperstepRunner


def undirected_edges(edges: DataFrame) -> DataFrame:
    """(src_id, dst_id[, ...]) -> symmetric deduped (src_id, dst_id),
    self-loops dropped (a self-loop never changes coreness under the
    h-operator and the peel convention excludes it)."""
    e = edges.select("src_id", "dst_id").filter(F.col("src_id") != F.col("dst_id"))
    return (
        e.unionByName(
            e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
        )
        .distinct()
    )


def coreness(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 4,
    resume: bool = False,
    run_id: str = "kcore",
    metrics_sink: list | None = None,
) -> tuple[DataFrame, int]:
    """Returns (cores(id, core), supersteps_run) — exact coreness.

    The input is treated as undirected: edges are symmetrized and
    deduplicated before the fixpoint iteration.
    """
    p = num_blocks or auto_blocks(
        edges.count(), spark.sparkContext.defaultParallelism
    )

    # rename once: the init state derives from the same edge plan, so the
    # per-step join would otherwise be an ambiguous self-join
    und = (
        undirected_edges(edges)
        .select(F.col("src_id").alias("e_v"), F.col("dst_id").alias("e_u"))
        .repartition(p, "e_u")
        .persist()
    )
    und.count()

    deg = und.groupBy(F.col("e_v").alias("id")).agg(
        F.count("*").cast("long").alias("core")
    )
    init = deg.repartition(p, "id")

    def step_fn(state: DataFrame, step: int):
        # neighbor values ride to the dst-partitioned static edges
        c = state.hint("shuffle_hash")
        nbr = c.join(und, c.id == und.e_u).select(
            F.col("e_v").alias("v"), F.col("core").alias("nc")
        )
        w = Window.partitionBy("v").orderBy(F.col("nc").desc())
        hidx = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("v")
            .agg(
                F.sum(
                    F.when(F.col("nc") >= F.col("rn"), F.lit(1)).otherwise(F.lit(0))
                ).cast("long").alias("h")
            )
        )
        prev = state.select("id", F.col("core").alias("prev"))
        new_state = (
            prev.join(hidx.hint("shuffle_hash"), prev.id == hidx.v, "left")
            .select(
                "id",
                F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("core"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_state.filter(F.col("core") != F.col("prev")).count()
        return new_state.select("id", "core"), {"changed": float(changed)}

    runner = SuperstepRunner(
        spark, checkpoint_dir=checkpoint_dir, run_id=run_id,
        checkpoint_every=checkpoint_every,
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cores, steps = runner.run(
            init,
            step_fn,
            converged=lambda m: m["changed"] == 0.0,
            max_iter=max_iter,
            resume=resume,
            pre_truncated=True,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    if metrics_sink is not None:
        metrics_sink.extend(runner.history)
    und.unpersist()
    return cores.select("id", "core"), steps
