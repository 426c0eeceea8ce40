"""Edge-table derivation: corpus → (vertices, edges).

The reference builds its dependency DAG by hashing producers on output
tensor name and probing with consumer input names — an equi-join on name
(reference: graph.py:7-24; uniqueness assert graph.py:14). Here the same
semantics run as a distributed Spark join:

  defs(symbol → file)   — JVM regexp on the module header
  refs(file → symbol)   — vectorized pandas-UDF extraction, exploded
  edges = refs ⋈ defs on symbol, grouped to (src_id, dst_id, weight)

Unlike the reference we do NOT assert single-consumer/single-output
(SURVEY §4.5#6): a module imported by many files yields many edges.

Vertex ids are ``xxhash64(repo, path)`` — deterministic, assignable with
zero shuffle at any scale (no global row_number bottleneck). At 10^12
files the 64-bit birthday collision probability is ~2.7%; the scale path
is documented in ``vertex_ids_dense`` (range-partitioned two-level id),
while tests verify the hash path collision-free at test sizes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import content_sha256, defined_symbol, extract_refs


def vertex_id(repo: str = "repo", path: str = "path") -> F.Column:
    return F.xxhash64(F.col(repo), F.col(path))


@dataclass
class Graph:
    """Derived graph: vertices(id, repo, path, content_sha256),
    edges(src_id, dst_id, weight), out_degrees(id, out_degree)."""

    vertices: DataFrame
    edges: DataFrame

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src_id").alias("id")).agg(
            F.sum("weight").alias("out_weight"), F.count("*").alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst_id").alias("id")).agg(
            F.sum("weight").alias("in_weight"), F.count("*").alias("in_degree")
        )


def derive_vertices(files: DataFrame) -> DataFrame:
    return files.select(
        vertex_id().alias("id"),
        "repo",
        "path",
        content_sha256().alias("content_sha256"),
    )


def derive_edges(files: DataFrame) -> Graph:
    """files(repo, path, commit, lang, content) → Graph.

    Plan shape (checked via .explain in tests/bench): one shuffle for the
    symbol equi-join, one for the (src,dst) aggregation; the pandas UDF
    runs inside the scan stage (Arrow exchange), filters/pruning pushed
    to parquet when files comes from disk.
    """
    vertices = derive_vertices(files)

    defs = files.select(
        vertex_id().alias("dst_id"),
        defined_symbol().alias("symbol"),
    ).filter(F.col("symbol") != "")

    refs = files.select(
        vertex_id().alias("src_id"),
        F.explode(extract_refs(F.col("content"), F.col("lang"))).alias("symbol"),
    )

    edges = (
        refs.join(defs, "symbol", "inner")
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(vertices=vertices, edges=edges)


def assert_content_integrity(files: DataFrame, vertices: DataFrame) -> None:
    """Per-row sha256(content) equality between source and derived table
    (end-to-end invariant, BASELINE.json input_hint). Raises on mismatch."""
    src = files.select(
        vertex_id().alias("id"), content_sha256().alias("sha_src")
    )
    joined = src.join(vertices.select("id", "content_sha256"), "id", "full_outer")
    bad = joined.filter(
        F.col("sha_src").isNull()
        | F.col("content_sha256").isNull()
        | (F.col("sha_src") != F.col("content_sha256"))
    ).count()
    if bad:
        raise AssertionError(f"content sha256 integrity violated for {bad} rows")


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both orientations, weights summed per pair."""
    fwd = edges.select("src_id", "dst_id", "weight")
    rev = edges.select(
        F.col("dst_id").alias("src_id"),
        F.col("src_id").alias("dst_id"),
        "weight",
    )
    return (
        fwd.unionByName(rev)
        .groupBy("src_id", "dst_id")
        .agg(F.sum("weight").alias("weight"))
    )
