"""Strongly connected components against an iterative-Tarjan oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.scc import (
    strongly_connected_components,
)

from .util_oracles import scc_oracle


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _random_digraph(seed, n=30, m=70):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return sorted(out)


@pytest.mark.parametrize("seed,n,m", [(1, 30, 70), (2, 25, 40), (3, 20, 120)])
def test_scc_matches_tarjan(spark, seed, n, m):
    pairs = _random_digraph(seed, n, m)
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == scc_oracle(pairs)


def test_scc_two_cycles_one_way_bridge(spark):
    # cycle A: 0->1->2->0; cycle B: 10->11->10; bridge 2->10 (one way)
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10), (2, 10)]
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_scc_dag_all_singletons(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_self_loop_only_vertex_is_singleton(spark):
    pairs = [(5, 5), (0, 1), (1, 0)]
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == {0: 0, 1: 0, 5: 5}


def test_scc_nested_chain_of_cycles(spark):
    # chain of 3 cycles, each feeding the next: forces multiple peel
    # rounds under max-coloring (the big-id cycle colors everything
    # downstream of it... build so the MAX id sits upstream)
    # cycle X: 100<->101, feeds cycle Y: 50<->51, feeds cycle Z: 1<->2
    pairs = [
        (100, 101), (101, 100), (101, 50),
        (50, 51), (51, 50), (51, 1),
        (1, 2), (2, 1),
    ]
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == {100: 100, 101: 100, 50: 50, 51: 50, 1: 1, 2: 1}


def test_scc_descending_id_path_peels_in_log_rounds(spark):
    """r4 ADVICE worst case: a plain path whose ids DESCEND along edge
    direction. Raw-id coloring roots exactly one vertex per peel round
    (n rounds — RuntimeError past max_rounds=64); salted-hash
    priorities make the expected root chain O(log n), so a 200-vertex
    descending path must finish comfortably inside the default cap."""
    n = 200
    pairs = [(i + 1, i) for i in range(n - 1)]
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(spark, _edges_df(spark, pairs)).collect()
    }
    assert got == {i: i for i in range(n)}
