"""DAG operators: topological sort, longest-path DP, chain decomposition.

Reference precedents:
- Kahn topological sort (reference: graph.py:210-224) → iterative
  in-degree-0 peel via anti-join; returns each vertex's topological
  LEVEL (all level-k vertices are mutually unordered, so the level
  order is a valid — and deterministic — topological order when read
  as (level, id)).
- Longest-path DP with predecessor backtracking (reference:
  graph.py:32-58, used to find the model's main chain) → iterative
  relaxation: dist(v) = max over in-neighbors (dist(u) + 1), one
  join+groupBy-max per superstep until fixpoint (O(longest path)
  supersteps).
- Chain decomposition (reference: graph.py:157-207): repeatedly peel
  the longest remaining path. The contracted graphs this runs on are
  small by construction (the reference's are tens of vertices), so the
  peel loop is a driver loop over distributed longest-path passes —
  same shape as the reference's driver loop; the per-pass work is the
  distributed part.

All loops assume a DAG (the reference asserts acyclicity implicitly by
construction, graph.py:4-6); ``topological_levels`` raises on cycles
(unpeelable remainder) — the engine-side version of that invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.barrier import PlanBarrier, release_checkpoint
from ..plans.scale import auto_blocks


def topological_levels(
    spark: SparkSession, edges: DataFrame, max_iter: int = 10_000
) -> DataFrame:
    """Kahn peel as iterative anti-join. Returns (id, level).

    Each round removes the current in-degree-0 frontier; a vertex's
    level is the round it was peeled. Raises ValueError on a cycle.
    """
    p = auto_blocks(edges.count(), spark.sparkContext.defaultParallelism)
    remaining_edges = edges.select("src_id", "dst_id").distinct().persist()
    remaining = (
        remaining_edges.select(F.col("src_id").alias("id"))
        .unionByName(remaining_edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )
    result = None
    level = 0
    n_left = remaining.count()
    b_verts = PlanBarrier(spark, tag="topo_verts")
    b_edges = PlanBarrier(spark, tag="topo_edges")
    b_result = PlanBarrier(spark, tag="topo_result")
    # loop-scoped shuffle pin, restored on exit
    shuf_was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        while n_left > 0 and level < max_iter:
            has_in = remaining_edges.select(F.col("dst_id").alias("id")).distinct()
            # frontier is CHECKPOINTED (lineage cut), not merely cached:
            # the three cuts below each reference it, and b_verts's cut
            # releases the old `remaining` BEFORE b_edges's cut runs —
            # if frontier still carried lineage to that released
            # checkpoint, a cache bypass (reproduced with AQE off)
            # recomputes through it and dies with
            # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. A lineage-free frontier
            # makes the release order irrelevant under any session conf.
            frontier = remaining.join(has_in, "id", "left_anti").localCheckpoint(
                eager=True
            )
            n_front = frontier.count()
            if n_front == 0:
                raise ValueError(f"cycle detected: {n_left} vertices unpeelable")
            # accumulate levels through the barrier (materialized each
            # round) so no later union re-reads a released state.
            level_df = frontier.select("id", F.lit(level).alias("level"))
            result = b_result.cut(
                level_df if result is None else result.unionByName(level_df)
            )
            new_remaining = b_verts.cut(remaining.join(frontier, "id", "left_anti"))
            new_edges = b_edges.cut(
                remaining_edges.join(
                    frontier.select(F.col("id").alias("src_id")), "src_id", "left_anti"
                )
            )
            remaining.unpersist()
            remaining_edges.unpersist()
            release_checkpoint(frontier)
            remaining, remaining_edges = new_remaining, new_edges
            n_left -= n_front
            level += 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuf_was)
    if result is None:  # empty edge table → no vertices, no levels
        return spark.createDataFrame([], "id long, level int")
    return result.repartition(p, "id")


def longest_path_lengths(
    spark: SparkSession, edges: DataFrame, max_iter: int = 10_000
) -> DataFrame:
    """Longest-path DP over a DAG: (id, dist) where dist = length (in
    edges) of the longest path ENDING at id. Iterative relaxation to
    fixpoint (reference graph.py:36-44 computes exactly this, plus
    predecessor links recoverable by one extra join at the end)."""
    p = auto_blocks(edges.count(), spark.sparkContext.defaultParallelism)
    verts = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    barrier = PlanBarrier(spark, tag="longest_path")
    dist = (
        verts.select("id", F.lit(0).alias("dist"))
        .repartition(p, "id")
        .localCheckpoint(eager=True)
    )
    e = edges.select("src_id", "dst_id").distinct().repartition(p, "src_id").persist()
    # loop-scoped shuffle pin, restored on exit. AQE is deliberately
    # LEFT ALONE here: with adaptive execution disabled, this loop's
    # accumulate-union-of-checkpoints pattern trips a reproducible
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in PlanBarrier's release path
    # (test_topological_levels fails deterministically); the peel runs
    # one round per DAG level, so per-round replanning is cheap anyway.
    shuf_was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        for _ in range(max_iter):
            cand = (
                dist.join(e, dist.id == e.src_id)
                .groupBy(F.col("dst_id").alias("id"))
                .agg((F.max("dist") + 1).alias("cand"))
            )
            new_dist = (
                dist.join(cand, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("dist"), F.coalesce(F.col("cand"), F.col("dist"))
                    ).alias("dist"),
                )
                .persist()
            )
            changed = (
                new_dist.join(dist.select("id", F.col("dist").alias("prev")), "id")
                .filter(F.col("dist") != F.col("prev"))
                .count()
            )
            trunc = barrier.cut(new_dist)
            new_dist.unpersist()
            dist = trunc
            if changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", shuf_was)
    e.unpersist()
    return dist


def _assert_contracted_size(edges: DataFrame, max_vertices: int, op: str) -> None:
    """critical_path/chain_decomposition are documented CONTRACTED-graph
    operators (the reference's run on anchor graphs of tens of vertices,
    graph.py:157-207): their driver loops collect one row per path hop.
    Enforce the contract mechanically instead of by docstring promise."""
    n = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .limit(max_vertices + 1)
        .count()
    )
    if n > max_vertices:
        raise ValueError(
            f"{op} is a contracted-graph operator (driver loop per path "
            f"hop): input has > {max_vertices} vertices; contract the "
            f"graph first (graph_contraction / labelprop) or raise "
            f"max_vertices explicitly"
        )


def critical_path(
    spark: SparkSession, edges: DataFrame, max_vertices: int = 100_000
) -> list[int]:
    """The reference's 'main chain' (graph.py:47-58): backtrack the
    argmax of the longest-path DP. The path itself is at most
    O(longest-path) vertices — driver-sized — while every DP pass is
    distributed. Refuses inputs above ``max_vertices`` (see
    _assert_contracted_size)."""
    _assert_contracted_size(edges, max_vertices, "critical_path")
    return _critical_path_unchecked(spark, edges)


def _critical_path_unchecked(spark: SparkSession, edges: DataFrame) -> list[int]:
    """critical_path minus the contracted-size assert, for callers that
    already validated the graph at entry (chain_decomposition peels
    shrink monotonically, so re-checking per emitted chain would add
    one distributed distinct+limit+count job per chain for nothing)."""
    dist = longest_path_lengths(spark, edges).persist()
    e = edges.select("src_id", "dst_id").distinct().persist()
    # deterministic argmax: max dist, then min id
    end = dist.orderBy(F.col("dist").desc(), F.col("id").asc()).limit(1).collect()[0]
    path = [end.id]
    cur_id, cur_dist = end.id, end.dist
    preds = (
        e.join(dist.select(F.col("id").alias("src_id"), F.col("dist").alias("d_src")), "src_id")
        .select("src_id", "dst_id", "d_src")
        .persist()
    )
    while cur_dist > 0:
        prev = (
            preds.filter((F.col("dst_id") == cur_id) & (F.col("d_src") == cur_dist - 1))
            .orderBy("src_id")
            .limit(1)
            .collect()[0]
        )
        path.append(prev.src_id)
        cur_id, cur_dist = prev.src_id, prev.d_src
    dist.unpersist()
    e.unpersist()
    preds.unpersist()
    return list(reversed(path))


def chain_decomposition(spark: SparkSession, edges: DataFrame,
                        max_chains: int = 10_000,
                        max_vertices: int = 100_000) -> list[list[int]]:
    """Greedy longest-chain peel (reference graph.py:157-207): repeat —
    find the longest path in the remaining DAG, emit it, remove its
    vertices. Driver loop over distributed passes; intended for
    CONTRACTED (anchor-level) graphs — enforced by ``max_vertices``
    (see _assert_contracted_size)."""
    _assert_contracted_size(edges, max_vertices, "chain_decomposition")
    remaining = edges.select("src_id", "dst_id").distinct().persist()
    vert_count = (
        remaining.select(F.col("src_id").alias("id"))
        .unionByName(remaining.select(F.col("dst_id").alias("id")))
        .distinct()
        .count()
    )
    chains: list[list[int]] = []
    barrier = PlanBarrier(spark, tag="chains")
    seen = 0
    while seen < vert_count and len(chains) < max_chains:
        if remaining.take(1):
            chain = _critical_path_unchecked(spark, remaining)
        else:
            # isolated leftovers: each its own chain, deterministic order
            left = (
                edges.select(F.col("src_id").alias("id"))
                .unionByName(edges.select(F.col("dst_id").alias("id")))
                .distinct()
            )
            done = {v for c in chains for v in c}
            rest = sorted(r.id for r in left.collect() if r.id not in done)
            chains.extend([[v] for v in rest])
            break
        chains.append(chain)
        seen += len(chain)
        chain_df = spark.createDataFrame([(int(v),) for v in chain], "id long")
        new_remaining = barrier.cut(
            remaining.join(F.broadcast(chain_df.withColumnRenamed("id", "src_id")), "src_id", "left_anti")
            .join(F.broadcast(chain_df.withColumnRenamed("id", "dst_id")), "dst_id", "left_anti")
            .select("src_id", "dst_id")
        )
        remaining.unpersist()
        remaining = new_remaining.persist()
    return chains
