"""HITS, coreness (k-core), local clustering coefficient, and
personalized PageRank against independent hand oracles."""

from __future__ import annotations

import math
import random

import pytest

from cim_framework_graph_partitioning_spark.operators.hits import hits
from cim_framework_graph_partitioning_spark.operators.kcore import coreness
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank
from cim_framework_graph_partitioning_spark.operators.triangles import (
    local_clustering_coefficient,
)

from .util_oracles import (
    clustering_oracle,
    coreness_oracle,
    hits_oracle,
    ppr_oracle,
)


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(u), int(v), float(w)) for u, v, w in triples],
        "src_id long, dst_id long, weight double",
    )


def _random_edges(seed, n=40, m=120, weighted=True):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return [(u, v, float(rng.randint(1, 3)) if weighted else 1.0)
            for u, v in sorted(out)]


# --- HITS ----------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 2])
def test_hits_matches_numpy_oracle(spark, seed):
    triples = _random_edges(seed)
    scores, steps = hits(spark, _edges_df(spark, triples), tol=1e-8)
    got = {r.id: (r.hub, r.auth) for r in scores.collect()}
    want = hits_oracle(triples, tol=1e-8)
    assert set(got) == set(want)
    assert steps > 1
    for k in want:
        assert math.isclose(got[k][0], want[k][0], rel_tol=1e-6, abs_tol=1e-6), k
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-6, abs_tol=1e-6), k
    # both vectors unit-L2
    assert math.isclose(sum(h * h for h, _ in got.values()), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(a * a for _, a in got.values()), 1.0, abs_tol=1e-9)


def test_hits_bipartite_hub_authority_split(spark):
    # suppliers -> parts: sources are pure hubs (auth 0), sinks pure
    # authorities (hub 0)
    triples = [(1, 101, 1.0), (1, 102, 2.0), (2, 101, 1.0), (3, 103, 1.0)]
    scores, _ = hits(spark, _edges_df(spark, triples), tol=1e-10)
    got = {r.id: (r.hub, r.auth) for r in scores.collect()}
    for src in (1, 2, 3):
        assert got[src][1] == pytest.approx(0.0, abs=1e-12)
    for snk in (101, 102, 103):
        assert got[snk][0] == pytest.approx(0.0, abs=1e-12)
    # vertex 1 carries more weighted fan-out than 2 or 3
    assert got[1][0] > got[2][0] and got[1][0] > got[3][0]


def test_hits_empty_graph(spark):
    empty = spark.createDataFrame([], "src_id long, dst_id long, weight double")
    scores, steps = hits(spark, empty)
    assert scores.count() == 0 and steps == 0


# --- coreness ------------------------------------------------------------


@pytest.mark.parametrize("seed,n,m", [(1, 40, 120), (2, 60, 90), (3, 30, 200)])
def test_coreness_matches_peel_oracle(spark, seed, n, m):
    triples = _random_edges(seed, n=n, m=m)
    cores, steps = coreness(spark, _edges_df(spark, triples))
    got = {r.id: r.core for r in cores.collect()}
    want = coreness_oracle([(u, v) for u, v, _ in triples])
    assert got == want
    assert steps >= 1


def test_coreness_clique_plus_tail(spark):
    # 5-clique (coreness 4) with a pendant path (coreness 1)
    clique = [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10, 1.0), (10, 11, 1.0)]
    cores, _ = coreness(spark, _edges_df(spark, clique + tail))
    got = {r.id: r.core for r in cores.collect()}
    assert all(got[v] == 4 for v in range(5))
    assert got[10] == 1 and got[11] == 1


# --- local clustering coefficient ----------------------------------------


@pytest.mark.parametrize("seed", [5, 6])
def test_clustering_coefficient_matches_bruteforce(spark, seed):
    triples = _random_edges(seed, n=25, m=90)
    res = local_clustering_coefficient(_edges_df(spark, triples)).collect()
    got = {r.id: (r.degree, r.n_triangles, r.coeff) for r in res}
    want = clustering_oracle([(u, v) for u, v, _ in triples])
    assert set(got) == set(want)
    for k, (d, t, c) in want.items():
        assert got[k][0] == d and got[k][1] == t, k
        assert math.isclose(got[k][2], c, rel_tol=1e-12), k


def test_clustering_triangle_with_pendant(spark):
    # triangle 0-1-2, pendant 3 off vertex 0
    triples = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (0, 3, 1.0)]
    got = {
        r.id: (r.degree, r.n_triangles, r.coeff)
        for r in local_clustering_coefficient(_edges_df(spark, triples)).collect()
    }
    assert got[0] == (3, 1, pytest.approx(1.0 / 3.0))
    assert got[1] == (2, 1, pytest.approx(1.0))
    assert got[3] == (1, 0, 0.0)


# --- personalized PageRank ------------------------------------------------


@pytest.mark.parametrize("seed,srcs", [(7, [0, 3]), (8, [5])])
def test_personalized_pagerank_matches_numpy_oracle(spark, seed, srcs):
    triples = _random_edges(seed)
    s = spark.createDataFrame([(int(x),) for x in srcs], "id long")
    ranks, steps = pagerank(spark, _edges_df(spark, triples), sources=s)
    got = {r.id: r.rank for r in ranks.collect()}
    want = ppr_oracle(triples, srcs)
    assert set(got) == set(want)
    assert steps > 1
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-6, abs_tol=1e-6), k
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_personalized_pagerank_unknown_source_raises(spark):
    triples = _random_edges(9)
    s = spark.createDataFrame([(999_999,)], "id long")
    with pytest.raises(ValueError):
        pagerank(spark, _edges_df(spark, triples), sources=s)


def test_personalized_uniform_sources_equals_classic(spark):
    # S = all vertices must reproduce classic PageRank exactly
    triples = _random_edges(10)
    ids = sorted({u for u, _, _ in triples} | {v for _, v, _ in triples})
    s = spark.createDataFrame([(int(x),) for x in ids], "id long")
    r1, _ = pagerank(spark, _edges_df(spark, triples), tol=1e-8)
    r2, _ = pagerank(spark, _edges_df(spark, triples), tol=1e-8, sources=s)
    g1 = {r.id: r.rank for r in r1.collect()}
    g2 = {r.id: r.rank for r in r2.collect()}
    for k in g1:
        assert math.isclose(g1[k], g2[k], abs_tol=1e-12), k


def test_coreness_planted_mega_hub(spark):
    """r4 VERDICT #6: a planted high-degree hub must not put
    degree-many rows into one window task. The histogram h-index keys
    the shuffle on (vertex, value) and its per-vertex window sees
    #distinct neighbor VALUES rows. Star with 30k leaves + a 4-clique
    hanging off leaf 1 (hub NOT in the clique): hub and leaves coreness
    1, clique coreness 3 — exact."""
    n = 30_000
    star = [(0, i, 1.0) for i in range(1, n + 1)]
    cq = (n + 1, n + 2, n + 3, n + 4)
    clique = [(u, v, 1.0) for u in cq for v in cq if u < v]
    bridge = [(1, cq[0], 1.0)]
    cores, _ = coreness(spark, _edges_df(spark, star + clique + bridge))
    got = {r.id: r.core for r in cores.collect()}
    assert got[0] == 1
    assert all(got[i] == 3 for i in cq)
    assert all(got[i] == 1 for i in range(1, 50))
    assert len(got) == n + 5
