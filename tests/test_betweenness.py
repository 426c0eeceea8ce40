"""Sampled betweenness: hand-checked structures + exact-Brandes replay
(a sequential different-algorithm oracle)."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest

from cim_framework_graph_partitioning_spark.operators.betweenness import (
    betweenness_sampled,
    harmonic_centrality_sampled,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _src_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def _brandes(pairs, sources):
    """Sequential Brandes (2001) restricted to the given sources."""
    adj = defaultdict(list)
    verts = set()
    for u, v in pairs:
        adj[u].append(v)
        verts.update((u, v))
    bc = defaultdict(float)
    for s in sources:
        bc.setdefault(s, 0.0)
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for w in reversed(order):
            for x in adj[w]:
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
            else:
                bc[s] += 0.0
        for v in order:
            bc.setdefault(v, 0.0)
    return dict(bc)


def test_betweenness_directed_path(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {r.id: r.bc for r in
           betweenness_sampled(spark, _edges_df(spark, pairs),
                               _src_df(spark, [0])).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}


def test_betweenness_diamond_splits_sigma(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = {r.id: r.bc for r in
           betweenness_sampled(spark, _edges_df(spark, pairs),
                               _src_df(spark, [0])).collect()}
    assert got == {0: 0.0, 1: 0.5, 2: 0.5, 3: 0.0}


@pytest.mark.parametrize("seed", [1, 2])
def test_betweenness_matches_brandes(spark, seed):
    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < 100:
        u, v = rng.randrange(25), rng.randrange(25)
        if u != v:
            pairs.add((u, v))
    pairs = sorted(pairs)
    sources = [0, 5, 11]
    got = {r.id: r.bc for r in
           betweenness_sampled(spark, _edges_df(spark, pairs),
                               _src_df(spark, sources)).collect()}
    want = _brandes(pairs, sources)
    assert set(got) == set(want)
    for v, b in want.items():
        assert got[v] == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_betweenness_max_depth_raises(spark):
    pairs = [(i, i + 1) for i in range(10)]
    with pytest.raises(RuntimeError):
        betweenness_sampled(spark, _edges_df(spark, pairs),
                            _src_df(spark, [0]), max_depth=3)


def test_betweenness_isolated_source(spark):
    got = {r.id: r.bc for r in
           betweenness_sampled(spark, _edges_df(spark, [(1, 2)]),
                               _src_df(spark, [99])).collect()}
    assert got == {99: 0.0}


def test_harmonic_directed_path(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {r.id: r.harmonic for r in
           harmonic_centrality_sampled(spark, _edges_df(spark, pairs),
                                       _src_df(spark, [0])).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 0.5, 3: pytest.approx(1 / 3)}


@pytest.mark.parametrize("seed", [3])
def test_harmonic_matches_python_bfs(spark, seed):
    rng = random.Random(seed)
    pairs = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(70)}
                   - {(i, i) for i in range(20)})
    sources = [0, 7, 13]
    got = {r.id: r.harmonic for r in
           harmonic_centrality_sampled(spark, _edges_df(spark, pairs),
                                       _src_df(spark, sources)).collect()}
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
    want = defaultdict(float)
    for s in sources:
        want.setdefault(s, 0.0)
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            if d > 0:
                want[v] += 1.0 / d
            else:
                want.setdefault(v, 0.0)
    assert set(got) == set(want)
    for v, h in want.items():
        assert got[v] == pytest.approx(h, rel=1e-9, abs=1e-12)


def test_eccentricity_directed_path_and_isolated_source(spark):
    from cim_framework_graph_partitioning_spark.operators.betweenness import (
        eccentricity_sampled,
    )

    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {r.id: r.eccentricity for r in
           eccentricity_sampled(spark, _edges_df(spark, pairs),
                                _src_df(spark, [0, 2, 9])).collect()}
    # 9 has no outgoing edges: eccentricity 0 over its reachable set
    assert got == {0: 3, 2: 1, 9: 0}


@pytest.mark.parametrize("seed", [4])
def test_eccentricity_matches_python_bfs(spark, seed):
    from cim_framework_graph_partitioning_spark.operators.betweenness import (
        eccentricity_sampled,
    )

    rng = random.Random(seed)
    pairs = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(70)}
                   - {(i, i) for i in range(20)})
    sources = [0, 7, 13]
    got = {r.id: r.eccentricity for r in
           eccentricity_sampled(spark, _edges_df(spark, pairs),
                                _src_df(spark, sources)).collect()}
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
    want = {}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        want[s] = max(dist.values())
    assert got == want


def test_closeness_directed_path(spark):
    from cim_framework_graph_partitioning_spark.operators.betweenness import (
        closeness_centrality_sampled,
    )
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {r.id: r.closeness for r in
           closeness_centrality_sampled(spark, _edges_df(spark, pairs),
                                        _src_df(spark, [0, 2, 3])).collect()}
    # 0 reaches 3 others at distances 1+2+3=6 -> 3/6; 2 reaches one at 1;
    # 3 reaches nothing -> 0.0 by contract
    assert got == {0: pytest.approx(0.5), 2: pytest.approx(1.0), 3: 0.0}


@pytest.mark.parametrize("seed", [5])
def test_closeness_matches_python_bfs(spark, seed):
    from cim_framework_graph_partitioning_spark.operators.betweenness import (
        closeness_centrality_sampled,
    )
    rng = random.Random(seed)
    pairs = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(70)}
                   - {(i, i) for i in range(20)})
    sources = [0, 7, 13]
    got = {r.id: r.closeness for r in
           closeness_centrality_sampled(spark, _edges_df(spark, pairs),
                                        _src_df(spark, sources)).collect()}
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
    want = {}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        total = sum(dist.values())
        want[s] = (len(dist) - 1) / total if total > 0 else 0.0
    assert set(got) == set(want)
    for s, c in want.items():
        assert got[s] == pytest.approx(c, rel=1e-12)
