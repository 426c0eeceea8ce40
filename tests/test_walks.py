"""Deterministic random walks against a pure-python replay oracle."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.walks import random_walks

from .util_oracles import walks_oracle


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src_id long, dst_id long, weight double",
    )


def _random_digraph(seed, n=30, m=90):
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2])
def test_walks_match_python_replay_md5(spark, seed):
    pairs = _random_digraph(seed)
    got = {
        (r.start_id, r.walk_no, r.step): r.vertex_id
        for r in random_walks(
            spark, _edges_df(spark, pairs), walk_length=5, num_walks=2,
            seed=7, hash_family="md5",
        ).collect()
    }
    want = walks_oracle(pairs, walk_length=5, num_walks=2, seed=7)
    assert got == want


def test_walks_deterministic_across_runs_and_partitionings(spark):
    pairs = _random_digraph(3)
    df = _edges_df(spark, pairs)
    a = random_walks(spark, df, walk_length=4, num_walks=1, seed=1).collect()
    b = random_walks(
        spark, df.repartition(7), walk_length=4, num_walks=1, seed=1
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_walks_dead_end_stops_early(spark):
    # path 0 -> 1 -> 2; vertex 2 has no out-edge
    got = {
        (r.start_id, r.walk_no, r.step): r.vertex_id
        for r in random_walks(
            spark, _edges_df(spark, [(0, 1), (1, 2)]), walk_length=5
        ).collect()
    }
    # start 0: steps 0,1,2 then stops; start 1: steps 0,1 then stops
    assert got == {
        (0, 0, 0): 0, (0, 0, 1): 1, (0, 0, 2): 2,
        (1, 0, 0): 1, (1, 0, 1): 2,
    }


def test_walks_respect_start_set_and_walk_count(spark):
    pairs = _random_digraph(4)
    starts = spark.createDataFrame([(0,), (1,)], "id long")
    res = random_walks(
        spark, _edges_df(spark, pairs), walk_length=3, num_walks=3,
        starts=starts,
    )
    step0 = res.filter(F.col("step") == 0)
    assert step0.count() == 6  # 2 starts x 3 walks
    assert {r.start_id for r in step0.collect()} == {0, 1}


# --- node2vec-style biased walks -------------------------------------------


@pytest.mark.parametrize("seed,weights", [(1, (1, 4, 2)), (2, (3, 1, 1))])
def test_biased_walks_match_python_replay_md5(spark, seed, weights):
    from cim_framework_graph_partitioning_spark.operators.walks import biased_walks

    from .util_oracles import biased_walks_oracle

    wr, wc, wf = weights
    pairs = _random_digraph(seed)
    got = {
        (r.start_id, r.walk_no, r.step): r.vertex_id
        for r in biased_walks(
            spark, _edges_df(spark, pairs), walk_length=5, num_walks=2,
            seed=7, return_weight=wr, common_weight=wc, far_weight=wf,
            hash_family="md5",
        ).collect()
    }
    want = biased_walks_oracle(pairs, 5, 2, 7, wr, wc, wf)
    assert got == want


def test_biased_walks_deterministic_across_partitionings(spark):
    from cim_framework_graph_partitioning_spark.operators.walks import biased_walks

    pairs = _random_digraph(5)
    df = _edges_df(spark, pairs)
    kw = dict(walk_length=4, num_walks=1, seed=3,
              return_weight=1, common_weight=2, far_weight=4)
    a = biased_walks(spark, df, **kw).collect()
    b = biased_walks(spark, df.repartition(7), **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_biased_walks_zero_return_weight_cannot_backtrack(spark):
    """On the undirected path 0-1, a walker at 1 whose only candidate is
    its prev has total weight 0 with return_weight=0: the walk ends
    rather than being forced back."""
    from cim_framework_graph_partitioning_spark.operators.walks import biased_walks

    pairs = [(0, 1), (1, 0)]
    got = {
        (r.start_id, r.walk_no, r.step): r.vertex_id
        for r in biased_walks(
            spark, _edges_df(spark, pairs), walk_length=5,
            return_weight=0, common_weight=1, far_weight=1,
        ).collect()
    }
    # both walks take step 1 (uniform) then die at the backtrack-only step
    assert got == {(0, 0, 0): 0, (0, 0, 1): 1, (1, 0, 0): 1, (1, 0, 1): 0}


def test_biased_walks_rejects_bad_weights(spark):
    from cim_framework_graph_partitioning_spark.operators.walks import biased_walks

    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        biased_walks(spark, df, return_weight=-1)
    with pytest.raises(ValueError):
        biased_walks(spark, df, return_weight=0, common_weight=0, far_weight=0)
    with pytest.raises(ValueError):
        biased_walks(spark, df, return_weight=1.5)  # type: ignore[arg-type]
