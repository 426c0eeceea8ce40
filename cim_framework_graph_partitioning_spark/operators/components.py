"""Connected components via iterative min-label propagation.

Reference precedent: the 4-wave label absorption in ``get_belong_node``
(reference: graph.py:30-123) — each wave propagates a representative
label to unlabeled neighbors until total coverage (assert graph.py:121).
Here the same mechanism runs symmetrically to a fixpoint: every vertex
repeatedly adopts the minimum label among itself and its neighbors, with
the driver checking the number of changed labels per superstep (the
reference's driver-side convergence role, calc_cost.py:419-420).

Scale note: plain min-label propagation needs O(diameter) supersteps —
fine for power-law link graphs (diameter ~ log N). Each superstep is one
join + one groupBy-min over the symmetrized edge table, which is cached
and hash-partitioned once; large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond") is the documented
upgrade path for high-diameter graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner
from .edges import symmetrize


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    run_id: str = "cc",
) -> tuple[DataFrame, int]:
    """Returns (labels(id, component), supersteps). component = min vertex
    id in the component (deterministic canonical representative)."""
    p = spark.sparkContext.defaultParallelism
    und = symmetrize(edges).select("src_id", "dst_id").repartition(p, "src_id").persist()
    verts = (
        und.select(F.col("src_id").alias("id"))
        .unionByName(und.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )
    init = verts.select("id", F.col("id").alias("component"))

    def step_fn(labels: DataFrame, step: int):
        nbr_min = (
            labels.hint("shuffle_hash").join(und, labels.id == und.src_id)
            .groupBy("dst_id")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst_id, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        ).persist()
        # one action: change count (materializes the new state cache)
        changed = (
            new_labels.join(
                labels.select("id", F.col("component").alias("prev")), "id"
            )
            .filter(F.col("component") != F.col("prev"))
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
