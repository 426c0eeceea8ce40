"""Multi-source shortest paths and Adamic-Adar link prediction against
independent oracles (Dijkstra / brute force)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.linkpred import adamic_adar_pairs
from cim_framework_graph_partitioning_spark.operators.paths import shortest_paths

from .util_oracles import adamic_adar_oracle, sssp_oracle


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(u), int(v), float(w)) for u, v, w in triples],
        "src_id long, dst_id long, weight double",
    )


def _random_weighted(seed, n=40, m=120):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return [(u, v, float(rng.randint(1, 9))) for u, v in sorted(out)]


# --- shortest paths -------------------------------------------------------


@pytest.mark.parametrize("seed,srcs", [(1, [0]), (2, [0, 5, 7])])
def test_sssp_matches_dijkstra(spark, seed, srcs):
    triples = _random_weighted(seed)
    s = spark.createDataFrame([(int(x),) for x in srcs], "id long")
    dists, steps = shortest_paths(spark, _edges_df(spark, triples), s)
    got = {r.id: r.dist for r in dists.collect()}
    want = sssp_oracle(triples, srcs)
    assert set(got) == set(want)
    assert steps >= 1
    for k, w in want.items():
        if w is None:
            assert got[k] is None, k
        else:
            # both are IEEE sums along the same optimal path: exact
            assert got[k] == w, (k, got[k], w)


def test_sssp_cycle_and_unreachable(spark):
    # cycle 0->1->2->0 plus disconnected 9->10; source 0
    triples = [(0, 1, 2.0), (1, 2, 2.0), (2, 0, 2.0), (9, 10, 1.0)]
    s = spark.createDataFrame([(0,)], "id long")
    dists, _ = shortest_paths(spark, _edges_df(spark, triples), s)
    got = {r.id: r.dist for r in dists.collect()}
    assert got[0] == 0.0 and got[1] == 2.0 and got[2] == 4.0
    assert got[9] is None and got[10] is None


def test_sssp_shorter_path_wins_over_fewer_hops(spark):
    # direct 0->2 costs 10; 0->1->2 costs 3
    triples = [(0, 2, 10.0), (0, 1, 1.0), (1, 2, 2.0)]
    s = spark.createDataFrame([(0,)], "id long")
    dists, _ = shortest_paths(spark, _edges_df(spark, triples), s)
    got = {r.id: r.dist for r in dists.collect()}
    assert got[2] == 3.0


def test_sssp_negative_weight_rejected(spark):
    s = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        shortest_paths(spark, _edges_df(spark, [(0, 1, -1.0)]), s)


# --- Adamic-Adar ----------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 4])
def test_adamic_adar_matches_bruteforce(spark, seed):
    triples = _random_weighted(seed, n=25, m=80)
    res = adamic_adar_pairs(_edges_df(spark, triples)).collect()
    got = {(r.src_id, r.dst_id): (r.common_neighbors, r.aa_score) for r in res}
    want = adamic_adar_oracle([(u, v) for u, v, _ in triples])
    assert set(got) == set(want)
    for k, (c, s) in want.items():
        assert got[k][0] == c, k
        assert math.isclose(got[k][1], s, rel_tol=1e-12), k


def test_adamic_adar_excludes_adjacent_and_caps_hubs(spark):
    # star center 0 with leaves 1..5 (deg 5), plus edge 1-2
    triples = [(0, i, 1.0) for i in range(1, 6)] + [(1, 2, 1.0)]
    df = _edges_df(spark, triples)
    got = {(r.src_id, r.dst_id): r.common_neighbors
           for r in adamic_adar_pairs(df).collect()}
    # 1-2 adjacent: excluded even though they share center 0
    assert (1, 2) not in got
    # 3-4 share only the center
    assert got[(3, 4)] == 1
    # capping below the center's degree kills all wedges through it:
    # only (3,4)-style pairs via 0 existed, plus pairs via 1 or 2 (deg 2)
    capped = {(r.src_id, r.dst_id): r.common_neighbors
              for r in adamic_adar_pairs(df, max_degree=2).collect()}
    want = adamic_adar_oracle([(u, v) for u, v, _ in triples], max_degree=2)
    assert capped == {k: v[0] for k, v in want.items()}


def test_adamic_adar_plan_reuses_materialized_und(spark):
    """The symmetrized edge table must still be MATERIALIZED when the
    caller executes the returned plan (r4 VERDICT #5: a
    persist/unpersist pair inside the function was released before the
    first action, so the plan's three und scans each recomputed the
    symmetrize union from scratch). Mechanical check: the final plan's
    und scans are ExistingRDD leaves — the symmetrize Union/distinct
    must NOT appear in the executed plan."""
    triples = [(0, i, 1.0) for i in range(1, 6)] + [(1, 2, 1.0)]
    out = adamic_adar_pairs(_edges_df(spark, triples))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    # and the result is still correct after the lifecycle change
    got = {(r.src_id, r.dst_id): r.common_neighbors for r in out.collect()}
    assert got[(3, 4)] == 1 and (1, 2) not in got


def _overlap_oracle(pairs, max_degree=None):
    """Brute-force neighbor-overlap family on the undirected graph."""
    nbrs = {}
    for u, v in pairs:
        if u != v:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
    out = {}
    verts = sorted(nbrs)
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if b in nbrs[a]:
                continue
            common = nbrs[a] & nbrs[b]
            if max_degree is not None:
                common = {z for z in common if len(nbrs[z]) <= max_degree}
            if not common:
                continue
            cn = len(common)
            out[(a, b)] = (
                cn,
                cn / (len(nbrs[a]) + len(nbrs[b]) - cn),
                sum(1.0 / len(nbrs[z]) for z in common),
                len(nbrs[a]) * len(nbrs[b]),
            )
    return out


@pytest.mark.parametrize("seed", [11, 12])
def test_neighbor_overlap_matches_bruteforce(spark, seed):
    from cim_framework_graph_partitioning_spark.operators.linkpred import (
        neighbor_overlap_pairs,
    )
    triples = _random_weighted(seed, n=25, m=80)
    res = neighbor_overlap_pairs(_edges_df(spark, triples)).collect()
    got = {(r.src_id, r.dst_id):
           (r.common_neighbors, r.jaccard, r.ra_score, r.pref_attach)
           for r in res}
    want = _overlap_oracle([(u, v) for u, v, _ in triples])
    assert set(got) == set(want)
    for k, (cn, jac, ra, pa) in want.items():
        assert got[k][0] == cn, k
        assert math.isclose(got[k][1], jac, rel_tol=1e-12), k
        assert math.isclose(got[k][2], ra, rel_tol=1e-12), k
        assert got[k][3] == pa, k


def test_neighbor_overlap_cap_keeps_full_endpoint_degrees(spark):
    from cim_framework_graph_partitioning_spark.operators.linkpred import (
        neighbor_overlap_pairs,
    )
    # star center 0 (deg 5) + path 1-6-2: capping centers at deg<=2
    # kills wedges THROUGH 0, but pairs via 6 keep the full
    # (uncapped) endpoint degrees in jaccard/pref_attach
    triples = [(0, i, 1.0) for i in range(1, 6)] + [(1, 6, 1.0), (6, 2, 1.0)]
    got = {(r.src_id, r.dst_id):
           (r.common_neighbors, r.jaccard, r.pref_attach)
           for r in neighbor_overlap_pairs(
               _edges_df(spark, triples), max_degree=2).collect()}
    want = _overlap_oracle([(u, v) for u, v, _ in triples], max_degree=2)
    assert set(got) == set(want)
    # the 1-2 pair survives via center 6 (deg 2): deg(1)=deg(2)=2 full
    assert got[(1, 2)][0] == 1
    assert got[(1, 2)][2] == 4  # 2 * 2, uncapped endpoint degrees
