"""K-truss decomposition (h-index fixpoint) against the sequential
peel oracle (a different algorithm) and closed-form structural cases."""

from __future__ import annotations

import random

import pytest

from cim_framework_graph_partitioning_spark.operators.truss import trussness

from .util_oracles import truss_oracle


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _random_edges(seed, n, m):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((min(u, v), max(u, v)))
    return sorted(out)


@pytest.mark.parametrize("seed,n,m", [(1, 20, 70), (2, 30, 120), (3, 15, 50)])
def test_trussness_matches_peel_oracle(spark, seed, n, m):
    pairs = _random_edges(seed, n=n, m=m)
    got_df, steps = trussness(spark, _edges_df(spark, pairs))
    got = {(r.src_id, r.dst_id): r.trussness for r in got_df.collect()}
    want = truss_oracle(pairs)
    assert got == want
    assert steps >= 1


def test_trussness_clique_plus_tail(spark):
    # every edge of K6 has trussness 6; tail edges trussness 2
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    tail = [(5, 20), (20, 21)]
    got_df, _ = trussness(spark, _edges_df(spark, clique + tail))
    got = {(r.src_id, r.dst_id): r.trussness for r in got_df.collect()}
    assert all(got[e] == 6 for e in clique)
    assert got[(5, 20)] == 2 and got[(20, 21)] == 2


def test_trussness_two_triangles_sharing_edge(spark):
    # bowtie on an edge: all five edges sit in the 3-truss, none in a 4-truss
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3)]
    got_df, _ = trussness(spark, _edges_df(spark, pairs))
    got = {(r.src_id, r.dst_id): r.trussness for r in got_df.collect()}
    assert got == {e: 3 for e in pairs}


def test_trussness_triangle_free_graph(spark):
    # a path: no triangles at all -> everything trussness 2
    pairs = [(i, i + 1) for i in range(6)]
    got_df, _ = trussness(spark, _edges_df(spark, pairs))
    got = {(r.src_id, r.dst_id): r.trussness for r in got_df.collect()}
    assert got == {e: 2 for e in pairs}


def test_trussness_symmetrizes_and_drops_self_loops(spark):
    # directed duplicates + a self-loop must not change the result
    pairs = [(0, 1), (1, 2), (0, 2)]
    noisy = pairs + [(1, 0), (2, 2)]
    got_df, _ = trussness(spark, _edges_df(spark, noisy))
    got = {(r.src_id, r.dst_id): r.trussness for r in got_df.collect()}
    assert got == {e: 3 for e in pairs}


def test_trussness_full_range_hash_ids(spark):
    """xxhash64-range vertex ids (near ±2^63) must not overflow the
    incidence build: the former middle-element-by-sum computation did
    (ANSI long overflow), latent until a full-64-bit-id graph had a
    triangle (r6)."""
    from pyspark.sql import functions as F

    big = 2**62 + 17
    rows = [(-big, big, 1.0), (big, big - 3, 1.0), (big - 3, -big, 1.0),
            (-big, 5, 1.0)]
    df = spark.createDataFrame(rows, "src_id long, dst_id long, weight double")
    tr, _ = trussness(spark, df)
    got = {(r.src_id, r.dst_id): r.trussness for r in tr.collect()}
    # the 3-cycle's edges are in one triangle -> trussness 3; the
    # pendant edge is trussness 2
    tri_edges = {(min(a, b), max(a, b)) for a, b in
                 [(-big, big), (big, big - 3), (big - 3, -big)]}
    for k, v in got.items():
        assert v == (3 if k in tri_edges else 2), (k, v)
