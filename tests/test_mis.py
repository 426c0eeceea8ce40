"""Maximal independent set: structural properties + sequential-greedy
(LFMIS) replay oracle — a different algorithm than the engine's
round-parallel local-minimum rule."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.mis import (
    maximal_independent_set,
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


def _md5_prio(seed, vid):
    h = hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()
    return int(h[:15], 16)


def _greedy_lfmis(pairs, seed):
    """Sequential greedy MIS scanning vertices in (md5 priority, id)
    order — the oracle the parallel rounds must reproduce exactly."""
    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    nbrs = {v: set() for v in verts}
    for u, v in pairs:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    mis = set()
    for v in sorted(verts, key=lambda x: (_md5_prio(seed, x), x)):
        if not (nbrs[v] & mis):
            mis.add(v)
    return {v: v in mis for v in verts}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_mis_matches_sequential_greedy(spark, seed):
    pairs = _random_graph(seed)
    got_df, steps = maximal_independent_set(
        spark, _edges_df(spark, pairs), seed=seed, hash_family="md5"
    )
    got = {r.id: r.in_mis for r in got_df.collect()}
    assert got == _greedy_lfmis(pairs, seed)
    assert 1 <= steps < 40  # parallel rounds, not one per vertex


def test_mis_independent_and_maximal(spark):
    pairs = _random_graph(9, n=60, m=200)
    got_df, _ = maximal_independent_set(spark, _edges_df(spark, pairs))
    got = {r.id: r.in_mis for r in got_df.collect()}
    nbrs = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    mis = {v for v, m in got.items() if m}
    for u, v in pairs:  # independence: no edge inside the set
        assert not (u in mis and v in mis)
    for v, m in got.items():  # maximality: every outsider has a MIS nbr
        if not m:
            assert nbrs[v] & mis


def test_mis_partitioning_invariant(spark):
    pairs = _random_graph(4)
    df = _edges_df(spark, pairs)
    a, _ = maximal_independent_set(spark, df, seed=5)
    b, _ = maximal_independent_set(spark, df.repartition(7), seed=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mis_self_loops_and_isolated(spark):
    """A self-loop-only vertex is isolated after simple-graph cleanup
    and must join; a triangle keeps exactly one vertex."""
    pairs = [(7, 7), (1, 2), (2, 3), (3, 1)]
    got_df, _ = maximal_independent_set(spark, _edges_df(spark, pairs))
    got = {r.id: r.in_mis for r in got_df.collect()}
    assert got[7] is True
    assert sum(got[v] for v in (1, 2, 3)) == 1
