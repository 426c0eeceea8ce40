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
