"""Balanced graph partitioner — the reference's CIM-style inner loop,
re-expressed as distributed gain scoring + driver-side move application.

Reference semantics preserved (NOT the implementation):
- numeric gain scoring per candidate move, highest first
  (reference: calc_cost.py:403-406 sorts candidates by per-replica
  compute time descending before trying moves);
- apply the best legal move(s), re-cost, KEEP THE GLOBAL BEST state
  (calc_cost.py:399-402);
- terminate when no legal move improves the objective
  (calc_cost.py:419-420);
- objective = communication + load imbalance, mirroring the reference's
  makespan = comm_time + max-core load (calc_cost.py:349-358):

      objective = edge_cut + lam * sum_p load_p^2

Execution shape per round (one superstep):
1. join symmetrized edges with the assignment on both endpoints;
2. per-vertex per-neighbor-part weight via EXPLICIT two-phase salted
   aggregation — partial sums per (vertex, part, salt) bound any hub
   vertex's reducer load (north-rule skew handling), final per
   (vertex, part);
3. gain per candidate move via a broadcast join against the k-row part
   load table; per-vertex argmax with deterministic tie-break;
4. driver collects the top-M positive-gain moves (global coordination,
   like the reference's driver picking the slowest node) and greedily
   keeps a PAIRWISE NON-ADJACENT subset (one distributed pass collects
   adjacency among the M moved vertices — M is driver-sized). For a
   non-adjacent batch the objective delta is EXACT and driver-computable:
     cut'  = cut − Σ (w_to − w_int)          (neighbors unmoved)
     ssq'  = from the k part loads + per-part move counts
   so no full-table re-cost is needed per round; an exact distributed
   recompute runs at termination (and under test) to confirm drift-free.

Cost per round: 2 distributed actions (candidate collect, adjacency
collect) + 1 lineage truncation — each a single pass over the salted
edge partitions, the property that holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import symmetrize


def exact_objective(und: DataFrame, assignment: DataFrame, lam: float) -> tuple[float, float, float]:
    """(objective, edge_cut, sum_sq_load), recomputed distributed."""
    a_src = assignment.select(F.col("id").alias("src_id"), F.col("part").alias("p_src"))
    a_dst = assignment.select(F.col("id").alias("dst_id"), F.col("part").alias("p_dst"))
    cut = (
        und.filter(F.col("src_id") < F.col("dst_id"))
        .join(a_src, "src_id")
        .join(a_dst, "dst_id")
        .filter(F.col("p_src") != F.col("p_dst"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)))
        .collect()[0][0]
    )
    loads = assignment.groupBy("part").count()
    ssq = loads.agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    return float(cut) + lam * float(ssq), float(cut), float(ssq)


def balanced_partition(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 8,
    lam: float = 0.05,
    max_rounds: int = 30,
    moves_per_round: int | None = None,
    salt_buckets: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, list[dict]]:
    """Partition vertices into k balanced parts minimizing weighted edge
    cut. Returns (assignment(id, part), round_history).

    ``round_history`` records per-round objective / cut / ssq / moves —
    the engine's analogue of the reference's per-iteration cost log
    (calc_cost.py:421-431). Accepted objectives are monotone
    non-increasing (tested property; deltas are exact by construction).
    """
    p = spark.sparkContext.defaultParallelism
    und = symmetrize(edges).repartition(p, "src_id").persist()
    verts = (
        und.select(F.col("src_id").alias("id"))
        .unionByName(und.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )

    best = verts.select(
        "id", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(k)).cast("int").alias("part")
    ).localCheckpoint(eager=True)
    n_verts = best.count()

    best_obj, cut, ssq = exact_objective(und, best, lam)
    loads_map = {
        r.part: r["count"] for r in best.groupBy("part").count().collect()
    }
    for part in range(k):
        loads_map.setdefault(part, 0)
    history = [{"round": 0, "objective": best_obj, "cut": cut, "ssq": ssq, "moves": 0}]
    m_default = moves_per_round

    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for rnd in range(1, max_rounds + 1):
            a = best
            # 1-2. per-vertex weight toward each part, salted two-phase
            labeled = und.join(
                a.select(F.col("id").alias("dst_id"), F.col("part").alias("p_dst")).hint("shuffle_hash"),
                "dst_id",
            )
            partial = labeled.groupBy(
                "src_id",
                "p_dst",
                F.pmod(F.xxhash64("dst_id"), F.lit(salt_buckets)).alias("_salt"),
            ).agg(F.sum("weight").alias("w_part"))
            w_to = partial.groupBy("src_id", "p_dst").agg(F.sum("w_part").alias("w"))

            cur = a.select(F.col("id").alias("src_id"), F.col("part").alias("p_cur"))
            w_to = w_to.join(cur.hint("shuffle_hash"), "src_id")
            w_int = (
                w_to.filter(F.col("p_dst") == F.col("p_cur"))
                .select("src_id", F.col("w").alias("w_int"))
            )
            cand = (
                w_to.filter(F.col("p_dst") != F.col("p_cur"))
                .join(w_int.hint("shuffle_hash"), "src_id", "left")
                .fillna({"w_int": 0.0})
            )

            loads_df = spark.createDataFrame(
                [(int(part), int(load)) for part, load in loads_map.items()],
                "part int, load long",
            )
            cand = (
                cand.join(
                    F.broadcast(loads_df.select(F.col("part").alias("p_cur"), F.col("load").alias("load_cur"))),
                    "p_cur",
                )
                .join(
                    F.broadcast(loads_df.select(F.col("part").alias("p_dst"), F.col("load").alias("load_to"))),
                    "p_dst",
                )
                .withColumn(
                    "gain",
                    F.col("w") - F.col("w_int")
                    - F.lit(lam) * 2.0 * (F.col("load_to") - F.col("load_cur") + 1.0),
                )
                .filter(F.col("gain") > 0)
            )
            # 3. best target per vertex, deterministic tie-break
            w_rank = Window.partitionBy("src_id").orderBy(
                F.col("gain").desc(), F.col("p_dst").asc()
            )
            best_moves = cand.withColumn("_rn", F.row_number().over(w_rank)).filter(
                F.col("_rn") == 1
            )

            # 4a. driver coordination: top-M positive-gain candidates
            m = m_default or max(1, n_verts // 20)
            moves = (
                best_moves.orderBy(F.col("gain").desc(), F.col("src_id").asc())
                .limit(m)
                .select("src_id", "p_cur", "p_dst", "w", "w_int", "gain")
                .collect()
            )
            if not moves:
                break

            # 4b. restrict to a pairwise non-adjacent subset so every
            # kept move's (w, w_int) stays valid → exact batch delta.
            mv_ids = spark.createDataFrame(
                [(r.src_id,) for r in moves], "id long"
            )
            adj_pairs = (
                und.join(F.broadcast(mv_ids.withColumnRenamed("id", "src_id")), "src_id", "left_semi")
                .join(F.broadcast(mv_ids.withColumnRenamed("id", "dst_id")), "dst_id", "left_semi")
                .select("src_id", "dst_id")
                .collect()
            )
            adj: dict[int, set[int]] = {}
            for r in adj_pairs:
                adj.setdefault(r.src_id, set()).add(r.dst_id)
                adj.setdefault(r.dst_id, set()).add(r.src_id)
            kept, kept_ids = [], set()
            for r in moves:  # already in (gain desc, id) order
                if adj.get(r.src_id, set()) & kept_ids:
                    continue
                kept.append(r)
                kept_ids.add(r.src_id)

            # 4c. exact sequential evaluation (the reference's one-move-
            # at-a-time hill climb, calc_cost.py:407-417, batched): each
            # move's delta is exact given the loads AFTER the moves
            # already accepted this round; non-improving moves are
            # skipped (e.g. the i-th move into the same target part pays
            # a growing imbalance price), not batch-fatal.
            new_loads = dict(loads_map)
            applied = []
            cut_delta = 0.0
            for r in kept:
                lq, lp = new_loads[int(r.p_dst)], new_loads[int(r.p_cur)]
                delta = -(r.w - r.w_int) + lam * 2.0 * (lq - lp + 1.0)
                if delta >= 0:
                    continue
                applied.append(r)
                cut_delta -= (r.w - r.w_int)
                new_loads[int(r.p_cur)] -= 1
                new_loads[int(r.p_dst)] += 1
            if not applied:
                break  # keep-best: no improving move exists
            kept = applied
            new_cut = cut + cut_delta
            new_ssq = float(sum(v * v for v in new_loads.values()))
            new_obj = new_cut + lam * new_ssq

            mv_df = spark.createDataFrame(
                [(r.src_id, int(r.p_dst)) for r in kept], "id long, new_part int"
            )
            best = (
                best.join(F.broadcast(mv_df), "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("new_part"), F.col("part")).alias("part"),
                )
                .localCheckpoint(eager=True)
            )
            best_obj, cut, ssq, loads_map = new_obj, new_cut, new_ssq, new_loads
            history.append(
                {"round": rnd, "objective": new_obj, "cut": new_cut,
                 "ssq": new_ssq, "moves": len(kept)}
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)

    # drift check: incremental bookkeeping must match a full recompute
    final_obj, final_cut, final_ssq = exact_objective(und, best, lam)
    history[-1]["objective_recomputed"] = final_obj
    assert abs(final_obj - best_obj) < 1e-6 * max(1.0, abs(final_obj)), (
        f"incremental objective drifted: {best_obj} vs {final_obj}"
    )
    und.unpersist()
    verts.unpersist()
    return best, history
