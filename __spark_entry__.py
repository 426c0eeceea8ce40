"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cim_framework_graph_partitioning_spark.queries import REGISTRY, q_top_depended_parts


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top-10 most depended-on
    vertices of the supplier→part dependency graph (the minimum
    end-to-end slice, SURVEY §7.1#3)."""
    return q_top_depended_parts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; iterative-to-convergence and
    LSH-internal operators are rows-only (no entry)."""
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
