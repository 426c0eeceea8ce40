"""Label spreading: numpy linear-algebra replay (fixed steps bit-exact)
+ closed-form convergence + seed-handling contracts."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cim_framework_graph_partitioning_spark.operators.spreading import (
    label_spreading,
)


def _graph(seed, n=20, m=60):
    rng = random.Random(seed)
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
                   - {(i, i) for i in range(n)})
    return pairs


def _setup(spark, pairs, seeds):
    edges = spark.createDataFrame(
        [(u, v, 1.0 + (u + v) % 2) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )
    sdf = spark.createDataFrame(seeds, "id long, label long")
    W = {}
    for u, v in pairs:
        w = 1.0 + (u + v) % 2
        key = (min(u, v), max(u, v))
        W[key] = W.get(key, 0) + w
    ids = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for (u, v), w in W.items():
        A[idx[u], idx[v]] = w
        A[idx[v], idx[u]] = w
    d = A.sum(axis=1)
    S = A / np.sqrt(np.outer(d, d))
    labels = sorted({l for _, l in seeds})
    Y = np.zeros((len(ids), len(labels)))
    for vid, l in seeds:
        if vid in idx:
            Y[idx[vid], labels.index(l)] = 1.0
    return edges, sdf, S, Y, idx, labels


@pytest.mark.parametrize("seed", [5, 6])
def test_spreading_fixed_steps_matches_numpy(spark, seed):
    pairs = _graph(seed)
    seeds = [(0, 100), (7, 200), (13, 200)]
    edges, sdf, S, Y, idx, labels = _setup(spark, pairs, seeds)
    alpha, k = 0.8, 3
    Fm = Y.copy()
    for _ in range(k):
        Fm = alpha * S @ Fm + (1 - alpha) * Y
    got_df, steps = label_spreading(spark, edges, sdf, alpha=alpha,
                                    tol=0.0, max_iter=k)
    assert steps == k
    got = {(r.id, r.label): r.score for r in got_df.collect()}
    for (vid, l), sc in got.items():
        assert sc == pytest.approx(Fm[idx[vid], labels.index(l)], abs=1e-12)
    for v in idx:
        for l in labels:
            if Fm[idx[v], labels.index(l)] > 1e-15:
                assert (v, l) in got


def test_spreading_converges_to_closed_form(spark):
    pairs = _graph(9)
    seeds = [(1, 10), (4, 20)]
    edges, sdf, S, Y, idx, labels = _setup(spark, pairs, seeds)
    alpha = 0.8
    closed = np.linalg.solve(np.eye(len(idx)) - alpha * S, (1 - alpha) * Y)
    got_df, steps = label_spreading(spark, edges, sdf, alpha=alpha,
                                    tol=1e-12, max_iter=500)
    assert steps < 500
    got = {(r.id, r.label): r.score for r in got_df.collect()}
    for (v, l), sc in got.items():
        assert sc == pytest.approx(closed[idx[v], labels.index(l)],
                                   abs=1e-10)


def test_spreading_ignores_offgraph_seeds_and_handles_empty(spark):
    pairs = [(0, 1), (1, 2)]
    edges = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )
    sdf = spark.createDataFrame([(999, 7), (0, 7)], "id long, label long")
    got, _ = label_spreading(spark, edges, sdf, tol=0.0, max_iter=1)
    assert 999 not in {r.id for r in got.collect()}
    empty = spark.createDataFrame([], "id long, label long")
    out, steps = label_spreading(spark, edges, empty, max_iter=3)
    assert steps == 0 and out.count() == 0
