"""Edge tables derived from the TPC-H-ish testdata foreign keys.

The engine's graph operators run on any (src_id, dst_id, weight) table;
these helpers derive such tables from the driver-provided star schema
(TESTDATA.md) so every graph operator has a DuckDB-checkable oracle on
shared inputs. Part ids are offset to avoid colliding with supplier ids
(both are small ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_OFFSET = 100_000


def supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bipartite supplier→part graph; weight = lineitem count.
    Parts have no out-edges, so the whole part side is dangling —
    exercises PageRank's dangling-mass redistribution."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy(
        F.col("l_suppkey").alias("src_id"),
        (F.col("l_partkey") + PART_OFFSET).alias("dst_id"),
    ).agg(F.count("*").cast("double").alias("weight"))


def co_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected-ish co-purchase graph: suppliers sharing ≥1 part.
    One row per (a, b) with a < b; weight 1.0 (distinct pair)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    a = sp.select(F.col("l_suppkey").alias("src_id"), F.col("l_partkey").alias("p"))
    b = sp.select(F.col("l_suppkey").alias("dst_id"), F.col("l_partkey").alias("p"))
    return (
        a.join(b, "p")
        .filter(F.col("src_id") < F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


ORDER_OFFSET = 10_000_000


def order_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-chain DAG: customer → its first order (by
    o_orderdate, ties by o_orderkey), then order r → order r+1. A
    forest of paths whose depth = max orders per customer (25 at
    sf0.01), so the longest-path DP genuinely runs that many
    relaxation supersteps. Order ids are offset above the custkey
    range."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )
    first = r.filter(F.col("rn") == 1).select(
        F.col("o_custkey").alias("src_id"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst_id"),
    )
    nxt = r.filter(F.col("next_key").isNotNull()).select(
        (F.col("o_orderkey") + ORDER_OFFSET).alias("src_id"),
        (F.col("next_key") + ORDER_OFFSET).alias("dst_id"),
    )
    return first.unionByName(nxt).withColumn("weight", F.lit(1.0))


def co_part_edges(
    spark: SparkSession, sf_dir: str, order_mod: int | None = None,
    part_mod: int | None = None,
) -> DataFrame:
    """Undirected co-purchase graph over PARTS: parts appearing in the
    same order. One row per (a, b) with a < b; weight 1.0. Unlike the
    co-supplier projection (complete at every tested SF — suppliers
    share almost every part), this graph is sparse with real local
    structure (~6% density at sf0.01), so k-core and clustering
    coefficients are non-degenerate on it.

    ``order_mod``: optional order slice (keep l_orderkey % order_mod
    == 0), applied at the LINEITEM SCAN so each surviving order still
    contributes its complete per-order clique — local structure
    (triangles, cores) survives while edge volume drops ~1/order_mod.
    Gate queries use it to bound sf0.01 oracle cost; one-shot/fixpoint
    semantics are unchanged.

    ``part_mod``: optional VERTEX slice (keep l_partkey % part_mod
    == 1), i.e. the induced subgraph on ~1/part_mod of the parts —
    the knob that actually shrinks the vertex set (order slicing
    barely does: parts recur across orders). For per-VERTEX
    sequential-replay oracles (MIS) whose DuckDB cost is one
    recursive-CTE iteration per vertex."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if order_mod is not None:
        li = li.filter(F.pmod(F.col("l_orderkey"), F.lit(order_mod)) == 0)
    if part_mod is not None:
        li = li.filter(F.pmod(F.col("l_partkey"), F.lit(part_mod)) == 1)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src_id"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst_id"))
    return (
        a.join(b, "o")
        .filter(F.col("src_id") < F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def order_cycle_edges(
    spark: SparkSession,
    sf_dir: str,
    custkey_mod: int | None = None,
    custkey_rem: int = 1,
    ring_cap: int | None = None,
) -> DataFrame:
    """Directed graph with NON-TRIVIAL strongly connected components:
    per customer, its orders form a ring (order r → order r+1, last →
    first), plus an entry edge customer → first order. Every ring is
    one SCC of size = that customer's order count (1..25 at sf0.01);
    every customer vertex is a singleton SCC (nothing points back at
    it). Ground truth is closed-form: scc_id of an order = the min
    order id in its ring + ORDER_OFFSET — which is what makes this
    the oracle graph for the SCC driver query (the FK graphs are
    otherwise all DAGs/bipartite: no cycles anywhere).

    ``custkey_mod``/``custkey_rem``: optional component slice — keep
    only customers with o_custkey % custkey_mod == custkey_rem,
    filtered at the ORDERS SCAN (filtering the edge table afterwards
    would orphan other customers' ring tails). Used by driver queries
    that feed the result into contracted-graph operators.

    ``ring_cap``: optional max ring size — a customer's orders (in
    (o_orderdate, o_orderkey) order) are chunked into consecutive
    groups of at most ``ring_cap``, each group its own ring; only the
    FIRST ring gets the customer entry edge, the rest are isolated
    cycles (no cross-ring edges — those would re-extend the coloring
    fixpoint's propagation distance). The SCC fixpoint iterations are
    bounded by the longest ring, so gate queries use ring_cap=8 to
    bound the peel's Spark-job count at sf0.01 (uncapped rings reach
    25 orders → ~2x13 fused propagation iterations per peel round);
    semantics coverage — multi-size SCCs, singleton entry vertices —
    is unchanged, and arbitrary-digraph correctness stays pytest
    territory (tests/test_scc.py's Tarjan oracle)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    if custkey_mod is not None:
        o = o.filter(F.pmod(F.col("o_custkey"), F.lit(custkey_mod)) == custkey_rem)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r0 = o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    ).withColumn(
        "grp",
        F.floor((F.col("rn") - 1) / F.lit(ring_cap)) if ring_cap is not None
        else F.lit(0),
    )
    wg = Window.partitionBy("o_custkey", "grp").orderBy("rn")
    r = r0.select(
        "o_custkey",
        "o_orderkey",
        "rn",
        F.lead("o_orderkey").over(wg).alias("next_key"),
        F.first("o_orderkey").over(
            wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("first_key"),
    )
    entry = r.filter(F.col("rn") == 1).select(
        F.col("o_custkey").alias("src_id"),
        (F.col("o_orderkey") + ORDER_OFFSET).alias("dst_id"),
    )
    chain = r.filter(F.col("next_key").isNotNull()).select(
        (F.col("o_orderkey") + ORDER_OFFSET).alias("src_id"),
        (F.col("next_key") + ORDER_OFFSET).alias("dst_id"),
    )
    wrap = r.filter(F.col("next_key").isNull()).select(
        (F.col("o_orderkey") + ORDER_OFFSET).alias("src_id"),
        (F.col("first_key") + ORDER_OFFSET).alias("dst_id"),
    )
    return (
        entry.unionByName(chain).unionByName(wrap)
        .withColumn("weight", F.lit(1.0))
    )
