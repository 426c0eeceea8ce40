"""Deterministic random-walk corpus generation (DeepWalk-style).

Embedding pipelines (DeepWalk, node2vec, GraphSAGE samplers) train on
walk sequences; at 100 TB the walk generator IS the data pipeline, so
it must be restartable and reproducible — a crash-and-resume must not
resample different walks. Hence HASH-seeded walks, not RNG walks: the
neighbor chosen at step t of walk (v0, w) is

    rank = H(seed, t, cur, w, v0)  mod  deg(cur)

over the adjacency ranked by dst id. Every step is a pure function of
(edge table, seed), so walks are reproducible across runs,
partitionings, AND engines: the same hash-family parameterization as
minhash (dedup.py:115-134) — engine default xxhash64 (JVM, fastest),
``hash_family="md5"`` bit-reproducible in DuckDB
(conv(substr(md5(...), 1, 15)) ≡ CAST('0x' || substr(md5(...), 1, 15)
AS BIGINT)), which is what the driver oracle uses.

Scale shape:

* The ranked adjacency (src_id, dst_id, rank, deg) is built with ONE
  window pass, then cached hash-partitioned by src_id; each step
  equi-joins the walk frontier against it on cur == src_id with the
  rank == H mod deg selection evaluated at probe time (a per-matched-
  row condition, NOT a second shuffle key — keying on (src, rank)
  would re-exchange the whole cached adjacency every step). A step
  therefore costs one frontier-sized shuffle plus O(deg) probe work
  per walker, emitting exactly one row per surviving walk.
* Walk state is long-format (start_id, walk_no, step, vertex_id) and
  frontier-only: step t joins only the walks still alive at t-1
  (dead-ended walks drop out of the inner join and simply end, the
  standard DeepWalk convention).
* walk_length is a small constant (5-80 in practice), so the loop is
  a bounded plan chain; lineage is cut per step via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _step_hash(step: int, seed: int, hash_family: str) -> F.Column:
    """Non-negative long hash of (seed, step, cur, walk_no, start_id).

    start_id is part of the key (r4 ADVICE): without it, two walks with
    the same walk_no that meet at the same vertex at the same step would
    coalesce and share their entire suffix, correlating the corpus
    versus DeepWalk-style independent sampling."""
    if hash_family == "xxhash64":
        return F.xxhash64(
            F.lit(seed), F.lit(step), F.col("cur"), F.col("walk_no"),
            F.col("start_id"),
        )
    if hash_family == "md5":
        s = F.concat_ws(
            ":",
            F.lit(str(seed)),
            F.lit(str(step)),
            F.col("cur").cast("string"),
            F.col("walk_no").cast("string"),
            F.col("start_id").cast("string"),
        )
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_family {hash_family!r}")


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """(src_id, dst_id) → (src_id, dst_id, rank, deg) with rank in
    [0, deg) ordered by dst_id (deterministic, engine-replicable)."""
    e = edges.select("src_id", "dst_id").distinct()
    w = Window.partitionBy("src_id").orderBy("dst_id")
    ranked = e.withColumn("rank", F.row_number().over(w) - F.lit(1))
    deg = e.groupBy("src_id").agg(F.count("*").cast("long").alias("deg"))
    return ranked.join(deg, "src_id")


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_length: int = 5,
    num_walks: int = 1,
    starts: DataFrame | None = None,
    seed: int = 0,
    hash_family: str = "xxhash64",
    num_blocks: int | None = None,
) -> DataFrame:
    """Returns long-format walks: (start_id, walk_no, step, vertex_id)
    with step 0 = the start vertex. ``starts`` (one id column)
    defaults to every vertex with at least one out-edge. Walks that
    reach a vertex with no out-edges end early."""
    p = num_blocks or spark.sparkContext.defaultParallelism

    adj = ranked_adjacency(edges).repartition(p, "src_id").persist()
    adj.count()

    if starts is None:
        s = adj.select(F.col("src_id").alias("id")).distinct()
    else:
        s = starts.select(F.col(starts.columns[0]).alias("id")).distinct()
    walk_nos = spark.range(num_walks).select(F.col("id").alias("walk_no"))
    cur = (
        s.crossJoin(walk_nos)
        .select(
            F.col("id").alias("start_id"),
            "walk_no",
            F.col("id").alias("cur"),
        )
        .repartition(p, "cur")
        .localCheckpoint(eager=True)
    )
    out = cur.select(
        "start_id", "walk_no", F.lit(0).alias("step"),
        F.col("cur").alias("vertex_id"),
    )

    for step in range(1, walk_length + 1):
        pick = F.pmod(_step_hash(step, seed, hash_family), F.col("deg"))
        nxt = (
            cur.hint("shuffle_hash")
            .join(adj, cur.cur == adj.src_id)
            .filter(F.col("rank") == pick)
            .select("start_id", "walk_no", F.col("dst_id").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            nxt.select(
                "start_id", "walk_no", F.lit(step).alias("step"),
                F.col("cur").alias("vertex_id"),
            )
        )
        cur = nxt
        if cur.limit(1).count() == 0:
            break

    adj.unpersist()
    return out
