"""Greedy coloring: sequential-greedy replay oracle (the theorem the
operator rests on) + properness/structural properties."""

from __future__ import annotations

import hashlib
import random

import pytest

from cim_framework_graph_partitioning_spark.operators.coloring import (
    greedy_coloring,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _random_graph(seed, n=40, m=120):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return sorted(out)


def _greedy_oracle(pairs, seed):
    """Sequential greedy in (md5 priority, id) order: smallest color
    unused by already-colored neighbors."""
    def prio(v):
        h = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
        return (int(h[:15], 16), v)

    nbrs = {}
    for u, v in pairs:
        if u != v:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
    want = {}
    for v in sorted(nbrs, key=prio):
        used = {want[n] for n in nbrs[v] if n in want}
        c = 0
        while c in used:
            c += 1
        want[v] = c
    return want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_coloring_matches_sequential_greedy(spark, seed):
    pairs = _random_graph(seed)
    got_df, steps = greedy_coloring(
        spark, _edges_df(spark, pairs), seed=seed, hash_family="md5"
    )
    got = {r.id: r.color for r in got_df.collect()}
    assert got == _greedy_oracle(pairs, seed)
    assert steps >= 1


@pytest.mark.parametrize("seed", [4])
def test_coloring_proper_and_bounded(spark, seed):
    pairs = _random_graph(seed, n=30, m=90)
    got = {r.id: r.color for r in
           greedy_coloring(spark, _edges_df(spark, pairs), seed=seed)[0]
           .collect()}
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    for u, v in pairs:
        assert got[u] != got[v], (u, v)
    assert max(got.values()) <= max(deg.values())  # <= Delta+1 colors


def test_coloring_partitioning_invariant(spark):
    pairs = _random_graph(9, n=25, m=70)
    df = _edges_df(spark, pairs)
    a = {r.id: r.color for r in greedy_coloring(spark, df, seed=5)[0].collect()}
    b = {r.id: r.color
         for r in greedy_coloring(spark, df.repartition(13), seed=5)[0]
         .collect()}
    assert a == b


def test_coloring_self_loops_and_isolated(spark):
    # self-loop-only vertex is isolated under the simple-graph
    # convention -> color 0; a triangle needs exactly 3 colors
    pairs = [(1, 2), (2, 3), (1, 3), (7, 7)]
    got = {r.id: r.color for r in
           greedy_coloring(spark, _edges_df(spark, pairs), seed=1)[0]
           .collect()}
    assert got[7] == 0
    assert sorted(got[v] for v in (1, 2, 3)) == [0, 1, 2]
