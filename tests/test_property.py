"""Property-based tests (SURVEY §5.2#4): seeded random graphs/DAGs via
hypothesis, few examples (each example runs real Spark jobs)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cim_framework_graph_partitioning_spark.operators.components import (
    connected_components,
)
from cim_framework_graph_partitioning_spark.operators.dag import (
    longest_path_lengths,
    topological_levels,
)
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank

from .test_graph_algorithms import _edges_df
from .util_oracles import cc_oracle

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def random_dag(draw):
    """Random DAG: edges only from lower to higher id (acyclic by
    construction), 5-15 vertices."""
    n = draw(st.integers(min_value=5, max_value=15))
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 2),
                st.integers(min_value=1, max_value=n - 1),
            ).filter(lambda p: p[0] < p[1]),
            min_size=4,
            max_size=25,
        )
    )
    return [(u, v, 1.0) for u, v in sorted(pairs)]


@st.composite
def random_graph(draw):
    n = draw(st.integers(min_value=4, max_value=12))
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda p: p[0] != p[1]),
            min_size=3,
            max_size=20,
        )
    )
    return [(u, v, 1.0) for u, v in sorted(pairs)]


@given(random_dag())
@SET
def test_topo_levels_respect_edges_and_longest_path_dominates(spark, dag):
    df = _edges_df(spark, dag)
    levels = {r.id: r.level for r in topological_levels(spark, df).collect()}
    dist = {r.id: r.dist for r in longest_path_lengths(spark, df).collect()}
    for u, v, _ in dag:
        assert levels[u] < levels[v], (u, v, levels)
        assert dist[v] >= dist[u] + 1, (u, v, dist)
    # longest path length bounded by vertex count; sources at dist 0
    assert min(dist.values()) == 0
    assert max(dist.values()) <= len(levels) - 1


@given(random_graph())
@SET
def test_pagerank_mass_conserved(spark, triples):
    ranks, _ = pagerank(spark, _edges_df(spark, triples), tol=1e-8, max_iter=60)
    total = sum(r.rank for r in ranks.collect())
    assert math.isclose(total, 1.0, abs_tol=1e-9), total


@given(random_graph())
@SET
def test_cc_star_matches_union_find(spark, triples):
    labels, _ = connected_components(spark, _edges_df(spark, triples))
    got = {r.id: r.component for r in labels.collect()}
    assert got == cc_oracle([(u, v) for u, v, _ in triples])
