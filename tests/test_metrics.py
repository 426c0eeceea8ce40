"""Degree assortativity and modularity against hand-computed classics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.metrics import (
    degree_assortativity,
    modularity,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def test_assortativity_star_is_minus_one(spark):
    r = degree_assortativity(_edges_df(spark, [(0, 1), (0, 2), (0, 3)])).collect()[0]
    assert r.n_edges == 3
    assert r.assortativity == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_null(spark):
    # 4-cycle: every degree 2 — zero variance, undefined correlation
    r = degree_assortativity(
        _edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).collect()[0]
    assert r.n_edges == 4
    assert r.assortativity is None


def test_assortativity_path3(spark):
    r = degree_assortativity(_edges_df(spark, [(0, 1), (1, 2)])).collect()[0]
    assert r.assortativity == pytest.approx(-1.0)


def test_modularity_two_triangles_bridge(spark):
    """Classic: two triangles joined by one edge, communities = the
    triangles. m=7, within=3 each, cdeg=7 each:
    Q = 2*(3/7 - (7/14)^2) = 5/14."""
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    labels = spark.createDataFrame(
        [(i, 100) for i in (0, 1, 2)] + [(i, 200) for i in (3, 4, 5)],
        "id long, label long",
    )
    r = modularity(_edges_df(spark, pairs), labels).collect()[0]
    assert (r.n_edges, r.n_communities) == (7, 2)
    assert r.modularity == pytest.approx(5 / 14)


def test_modularity_single_community_is_zero(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = spark.createDataFrame([(i, 1) for i in range(3)], "id long, label long")
    r = modularity(_edges_df(spark, pairs), labels).collect()[0]
    assert r.modularity == pytest.approx(0.0)


def test_modularity_unlabeled_vertices_are_singletons(spark):
    """Missing labels fall back to singleton communities: an all-
    unlabeled triangle has Q = 3*(0/3 - (2/6)^2) = -1/3."""
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = spark.createDataFrame([], "id long, label long")
    r = modularity(_edges_df(spark, pairs), labels).collect()[0]
    assert r.n_communities == 3
    assert r.modularity == pytest.approx(-1 / 3)
