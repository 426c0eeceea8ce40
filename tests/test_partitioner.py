from __future__ import annotations

import random

from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.partitioner import (
    balanced_partition,
)

from .test_graph_algorithms import _edges_df


def _clustered_edges(seed=31, clusters=4, size=12, intra=30, inter=6):
    """Planted-partition graph: dense clusters, sparse cross edges."""
    rng = random.Random(seed)
    triples = set()
    for c in range(clusters):
        base = c * 1000
        n = 0
        while n < intra:
            u, v = base + rng.randrange(size), base + rng.randrange(size)
            if u != v and (u, v) not in triples:
                triples.add((u, v))
                n += 1
    n = 0
    while n < inter:
        cu, cv = rng.sample(range(clusters), 2)
        u = cu * 1000 + rng.randrange(size)
        v = cv * 1000 + rng.randrange(size)
        if (u, v) not in triples:
            triples.add((u, v))
            n += 1
    return [(u, v, 1.0) for u, v in sorted(triples)]


def test_partitioner_improves_and_is_monotone(spark):
    edges = _edges_df(spark, _clustered_edges())
    assignment, history = balanced_partition(spark, edges, k=4, max_rounds=15)
    objs = [h["objective"] for h in history]
    # accepted objectives strictly decrease (keep-best semantics,
    # reference calc_cost.py:399-420)
    assert all(a > b for a, b in zip(objs, objs[1:]))
    assert len(objs) >= 2  # at least one improving round on a planted graph
    # cut should drop substantially vs the hash init on a planted graph
    assert history[-1]["cut"] < history[0]["cut"]


def test_partitioner_assignment_valid_and_balanced(spark):
    edges = _edges_df(spark, _clustered_edges(seed=33))
    k = 4
    assignment, _ = balanced_partition(spark, edges, k=k, max_rounds=15)
    rows = assignment.collect()
    n = len(rows)
    assert len({r.id for r in rows}) == n  # exactly one part per vertex
    parts = {r.part for r in rows}
    assert parts <= set(range(k))
    loads = assignment.groupBy("part").count().collect()
    # imbalance bounded: no part exceeds 2x ideal on the planted graph
    assert max(r["count"] for r in loads) <= 2 * (n / k) + 1


def test_partitioner_deterministic(spark):
    triples = _clustered_edges(seed=35)
    df = _edges_df(spark, triples)
    a1, h1 = balanced_partition(spark, df.repartition(3), k=3, max_rounds=8)
    a2, h2 = balanced_partition(spark, df.repartition(5), k=3, max_rounds=8)
    assert [h["objective"] for h in h1] == [h["objective"] for h in h2]
    assert {(r.id, r.part) for r in a1.collect()} == {
        (r.id, r.part) for r in a2.collect()
    }


def test_objective_mode_ablations(spark):
    """Cost-model ablations (reference calc_cost.py:360-371 modes 3/4/6
    under the comm<->cut, calc<->load mapping): every mode must converge
    with a monotone exact objective, pass the built-in incremental-vs-
    recompute drift assert, and comm2x must value cut reduction exactly
    2x (its round-0 objective = default's + cut)."""
    import pytest

    from cim_framework_graph_partitioning_spark.operators.partitioner import (
        OBJECTIVE_MODES,
        exact_objective,
    )
    from cim_framework_graph_partitioning_spark.operators.edges import symmetrize

    edges = _edges_df(spark, _clustered_edges())
    hist_by_mode = {}
    for mode in OBJECTIVE_MODES:
        assignment, history = balanced_partition(
            spark, edges, k=4, max_rounds=6, objective_mode=mode
        )
        objs = [h["objective"] for h in history]
        assert objs == sorted(objs, reverse=True), (mode, objs)
        assert history[-1]["objective_mode"] == mode
        # the drift assert inside balanced_partition already compared the
        # incremental objective to exact_objective(mode); double-check
        # the recomputed value landed in history.
        assert "objective_recomputed" in history[-1]
        hist_by_mode[mode] = history

    # parity relation at round 0 (identical seed assignment across
    # modes): obj_comm2x = obj_default + cut
    h0d = hist_by_mode["default"][0]
    h0c = hist_by_mode["comm2x"][0]
    assert abs(h0c["objective"] - (h0d["objective"] + h0d["cut"])) < 1e-9
    # pipelined adds lam * B * max^2 on top of default at round 0
    und = symmetrize(edges)
    a, _ = balanced_partition(spark, edges, k=4, max_rounds=0)
    for mode in OBJECTIVE_MODES:
        obj, cut, ssq = exact_objective(und, a, 0.05, mode, pipeline_batch=8)
        assert obj >= cut >= 0

    with pytest.raises(ValueError):
        balanced_partition(spark, edges, k=4, objective_mode="nope")

def test_maxload_with_empty_part_no_drift(spark):
    """Regression: with objective_mode='maxload' and k larger than the
    graph can fill, exact_objective used to drop empty parts from the
    loads map (groupBy-count has no row for them) while the incremental
    loop padded all k — a lam*k_missing*max^2 drift that crashed the
    end-of-run assert. k=8 on a 4-vertex path guarantees empty parts."""
    edges = _edges_df(spark, [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)])
    # must complete without tripping the built-in drift assert
    assignment, history = balanced_partition(
        spark, edges, k=8, max_rounds=4, objective_mode="maxload"
    )
    assert assignment.count() == 4
    objs = [h["objective"] for h in history]
    assert objs == sorted(objs, reverse=True)
