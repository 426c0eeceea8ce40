"""Synchronous label propagation (community detection) with
deterministic tie-breaking.

Reference precedent: ``get_belong_node`` IS a constrained LPA — anchors
absorb satellites wave by wave with fixed priorities (reference:
graph.py:30-123; waves at :68-79, :83-94, :100-108, :111-119). The
engine's LPA is the symmetric, weight-aware generalization: each
superstep every vertex adopts the label with the maximum total incident
edge weight among its neighbors, ties broken by MINIMUM label id —
fully deterministic regardless of partitioning (north-rule requirement:
exact label parity at convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner
from .edges import symmetrize


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    run_id: str = "lpa",
) -> tuple[DataFrame, int]:
    """Returns (labels(id, label), supersteps_run).

    Synchronous LPA can oscillate on bipartite-ish structure, so the loop
    runs to ``max_iter`` or until no label changes, whichever first —
    with the deterministic tie-break both stopping modes are reproducible
    bit-for-bit across partitionings.
    """
    p = spark.sparkContext.defaultParallelism
    und = symmetrize(edges).repartition(p, "src_id").persist()
    verts = (
        und.select(F.col("src_id").alias("id"))
        .unionByName(und.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )
    init = verts.select("id", F.col("id").alias("label"))

    w = Window.partitionBy("dst_id").orderBy(
        F.col("wsum").desc(), F.col("label").asc()
    )

    def step_fn(labels: DataFrame, step: int):
        votes = (
            labels.hint("shuffle_hash").join(und, labels.id == und.src_id)
            .groupBy("dst_id", "label")
            .agg(F.sum("weight").alias("wsum"))
        )
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("dst_id", F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(winner, labels.id == winner.dst_id, "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        ).persist()
        # one action: change count (materializes the new state cache)
        changed = (
            new_labels.join(labels.select("id", F.col("label").alias("prev")), "id")
            .filter(F.col("label") != F.col("prev"))
            .count()
        )
        return new_labels, {"changed": float(changed)}

    runner = SuperstepRunner(spark, checkpoint_dir=checkpoint_dir, run_id=run_id)
    labels, steps = runner.run(
        init, step_fn, converged=lambda m: m["changed"] == 0, max_iter=max_iter,
        resume=resume,
    )
    und.unpersist()
    verts.unpersist()
    return labels, steps
