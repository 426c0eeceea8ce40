"""Louvain local-move rounds: python exact-arithmetic replay oracle +
the conflict-free (coloring-class) modularity monotonicity the
convergent composition relies on."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.community import (
    louvain_move_round,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _random_graph(seed, n=25, m=75):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((min(u, v), max(u, v)))
    return sorted(out)


def _replay(pairs, labels=None, movers=None):
    nbrs = {}
    for u, v in pairs:
        nbrs.setdefault(u, {}).setdefault(v, 0)
        nbrs[u][v] += 1
        nbrs.setdefault(v, {}).setdefault(u, 0)
        nbrs[v][u] += 1
    verts = sorted(nbrs)
    lab = {v: (labels or {}).get(v, v) for v in verts}
    k = {v: sum(nbrs[v].values()) for v in verts}
    m = sum(k.values()) // 2
    tot = {}
    for v in verts:
        tot[lab[v]] = tot.get(lab[v], 0) + k[v]
    new = {}
    for v in verts:
        if movers is not None and v not in movers:
            new[v] = lab[v]
            continue
        wvc = {}
        for u, wt in nbrs[v].items():
            wvc[lab[u]] = wvc.get(lab[u], 0) + wt
        D = lab[v]
        stay = 2 * m * wvc.get(D, 0) - k[v] * (tot[D] - k[v])
        cands = [(2 * m * wc - k[v] * tot[C], -C)
                 for C, wc in wvc.items() if C != D]
        if cands:
            g, negc = max(cands)
            new[v] = -negc if g > stay else D
        else:
            new[v] = D
    return new


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_louvain_round_matches_exact_replay(spark, seed):
    pairs = _random_graph(seed)
    df = _edges_df(spark, pairs)
    got1 = {r.id: r.community for r in louvain_move_round(df).collect()}
    want1 = _replay(pairs)
    assert got1 == want1
    # second round with a restricted mover set exercises labels=/movers=
    movers = {v for v in want1 if v % 2 == 0}
    lb = spark.createDataFrame(list(want1.items()), "id long, community long")
    mv = spark.createDataFrame([(v,) for v in movers], "id long")
    got2 = {r.id: r.community
            for r in louvain_move_round(df, labels=lb, movers=mv).collect()}
    assert got2 == _replay(pairs, labels=want1, movers=movers)


def test_louvain_bowtie_merges_triangles(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = {r.id: r.community
           for r in louvain_move_round(_edges_df(spark, pairs)).collect()}
    # every vertex moved into a neighbor's community within its triangle
    assert got[0] in (0, 1, 2) and got[4] in (3, 4, 5)


def test_louvain_coloring_class_rounds_monotone_modularity(spark):
    # the convergent composition: restrict each round's movers to one
    # greedy-coloring class (pairwise non-adjacent) -> every individual
    # move's gain computation stays valid under simultaneity, so Q is
    # non-decreasing round over round
    from cim_framework_graph_partitioning_spark.operators.coloring import (
        greedy_coloring,
    )
    from cim_framework_graph_partitioning_spark.operators.metrics import (
        modularity,
    )
    pairs = _random_graph(7, n=30, m=90)
    df = _edges_df(spark, pairs)
    colors, _ = greedy_coloring(spark, df, seed=3)
    colors_rows = colors.collect()
    n_colors = max(r.color for r in colors_rows) + 1
    lab = None
    q_prev = None
    for c in range(n_colors):
        movers = spark.createDataFrame(
            [(r.id,) for r in colors_rows if r.color == c], "id long"
        )
        lab_df = (
            spark.createDataFrame(
                list(lab.items()), "id long, community long"
            ) if lab is not None else None
        )
        new = louvain_move_round(df, labels=lab_df, movers=movers)
        lab = {r.id: r.community for r in new.collect()}
        q = modularity(
            df,
            spark.createDataFrame(list(lab.items()), "id long, label long"),
        ).collect()[0].modularity
        if q_prev is not None:
            assert q >= q_prev - 1e-12, (c, q_prev, q)
        q_prev = q


def test_louvain_rejects_fractional_weights(spark):
    df = spark.createDataFrame(
        [(1, 2, 0.5)], "src_id long, dst_id long, weight double"
    )
    with pytest.raises(ValueError, match="integer edge weights"):
        louvain_move_round(df)
