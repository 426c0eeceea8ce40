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
  makespan = comm_time + max-core load (calc_cost.py:349-358). Here:

      objective = edge_cut + lam * sum_p load_p^2

  with load in vertex counts; the exact delta of moving v: p→q is

      -gain(v,q) = -( w_to(v,q) - w_int(v) - lam*2*(load_q - load_p + 1) )

  so any single positive-gain move strictly decreases the objective.

Execution shape per round (one superstep):
1. join symmetrized edges with the assignment on both endpoints;
2. per-vertex per-neighbor-part weight via EXPLICIT two-phase salted
   aggregation — partial sums per (vertex, part, salt) bound any hub
   vertex's reducer load (north-rule skew handling), final per
   (vertex, part);
3. gain per candidate move via a broadcast join against the k-row part
   load table; per-vertex argmax with deterministic tie-break;
4. driver collects the top-M positive-gain moves (global coordination,
   like the reference's driver picking the slowest node), applies them
   with a broadcast join, recomputes the objective, keeps the best
   state; if a batched application regresses (move interaction), falls
   back to the single best move, which provably improves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import symmetrize


def _objective(und: DataFrame, assignment: DataFrame, lam: float) -> tuple[float, float, float]:
    """(objective, edge_cut, sum_sq_load) for the current assignment."""
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

    ``round_history`` records per-round objective / cut / imbalance /
    moves — the engine's analogue of the reference's per-iteration cost
    log (calc_cost.py:421-431). Accepted objectives are monotone
    non-increasing (tested property).
    """
    p = spark.sparkContext.defaultParallelism
    und = symmetrize(edges).repartition(p, "src_id").persist()
    verts = (
        und.select(F.col("src_id").alias("id"))
        .unionByName(und.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )

    assignment = verts.select(
        "id", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(k)).cast("int").alias("part")
    ).persist()
    n_verts = assignment.count()

    best_obj, cut, ssq = _objective(und, assignment, lam)
    history = [{"round": 0, "objective": best_obj, "cut": cut, "ssq": ssq, "moves": 0}]
    best = assignment
    m_default = moves_per_round

    for rnd in range(1, max_rounds + 1):
        a = best
        # 1-2. per-vertex weight toward each part, salted two-phase
        labeled = und.join(
            a.select(F.col("id").alias("dst_id"), F.col("part").alias("p_dst")),
            "dst_id",
        )
        partial = labeled.groupBy(
            "src_id",
            "p_dst",
            F.pmod(F.xxhash64("dst_id"), F.lit(salt_buckets)).alias("_salt"),
        ).agg(F.sum("weight").alias("w_part"))
        w_to = partial.groupBy("src_id", "p_dst").agg(F.sum("w_part").alias("w"))

        cur = a.select(F.col("id").alias("src_id"), F.col("part").alias("p_cur"))
        w_to = w_to.join(cur, "src_id")
        w_int = (
            w_to.filter(F.col("p_dst") == F.col("p_cur"))
            .select("src_id", F.col("w").alias("w_int"))
        )
        cand = (
            w_to.filter(F.col("p_dst") != F.col("p_cur"))
            .join(w_int, "src_id", "left")
            .fillna({"w_int": 0.0})
        )

        loads = a.groupBy("part").count()  # k rows — broadcast both ways
        cand = (
            cand.join(
                F.broadcast(loads.select(F.col("part").alias("p_cur"), F.col("count").alias("load_cur"))),
                "p_cur",
            )
            .join(
                F.broadcast(loads.select(F.col("part").alias("p_dst"), F.col("count").alias("load_to"))),
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

        # 4. driver coordination: top-M positive-gain moves
        m = m_default or max(1, n_verts // 20)
        moves = (
            best_moves.orderBy(F.col("gain").desc(), F.col("src_id").asc())
            .limit(m)
            .select("src_id", "p_dst", "gain")
            .collect()
        )
        if not moves:
            break

        def apply_moves(base: DataFrame, mv) -> DataFrame:
            mv_df = spark.createDataFrame(
                [(r.src_id, int(r.p_dst)) for r in mv], "id long, new_part int"
            )
            return (
                base.join(F.broadcast(mv_df), "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("new_part"), F.col("part")).alias("part"),
                )
                .persist()
            )

        trial = apply_moves(best, moves)
        obj, cut, ssq = _objective(und, trial, lam)
        if obj >= best_obj and len(moves) > 1:
            # batched moves interacted; the single best move is exact
            trial.unpersist()
            trial = apply_moves(best, moves[:1])
            obj, cut, ssq = _objective(und, trial, lam)
            moves = moves[:1]
        if obj >= best_obj:
            # keep-best: no acceptable improvement left
            trial.unpersist()
            break
        # accept: keep the global best (reference calc_cost.py:399-402)
        trial = trial.localCheckpoint(eager=True)
        if best.is_cached:
            best.unpersist()
        best = trial
        best_obj = obj
        history.append(
            {"round": rnd, "objective": obj, "cut": cut, "ssq": ssq, "moves": len(moves)}
        )

    und.unpersist()
    verts.unpersist()
    return best, history
