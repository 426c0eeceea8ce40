from __future__ import annotations

import pytest

from cim_framework_graph_partitioning_spark.operators.dag import (
    chain_decomposition,
    critical_path,
    longest_path_lengths,
    topological_levels,
)
from cim_framework_graph_partitioning_spark.operators.normalize import (
    normalize_corpus,
)

from .test_graph_algorithms import _edges_df

# diamond + tail DAG: 0→1→3→4, 0→2→3, 5 isolated-ish (5→4)
DAG = [(0, 1, 1.0), (0, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (3, 4, 1.0), (5, 4, 1.0)]


def test_topological_levels(spark):
    levels = {r.id: r.level for r in topological_levels(spark, _edges_df(spark, DAG)).collect()}
    assert levels == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_levels_empty_edges(spark):
    empty = _edges_df(spark, [])
    out = topological_levels(spark, empty)
    assert out.columns == ["id", "level"]
    assert out.count() == 0


def test_topological_cycle_detection(spark):
    cyc = _edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(spark, cyc)


def test_longest_path_and_critical_path(spark):
    df = _edges_df(spark, DAG)
    dist = {r.id: r.dist for r in longest_path_lengths(spark, df).collect()}
    assert dist == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    # critical path: deterministic tie-break picks 0→1→3→4
    assert critical_path(spark, df) == [0, 1, 3, 4]


def test_chain_decomposition_covers_all_vertices(spark):
    df = _edges_df(spark, DAG)
    chains = chain_decomposition(spark, df)
    assert chains[0] == [0, 1, 3, 4]
    flat = [v for c in chains for v in c]
    assert sorted(flat) == [0, 1, 2, 3, 4, 5]
    assert len(flat) == len(set(flat))  # partition: no vertex twice


def test_normalize_corpus(spark):
    rows = [
        ("r0", "a.py", "c2", "python", "# module: m0\nx"),
        ("r0", "a.py", "c1", "python", "# module: m0\nx"),  # dup path, older commit wins
        ("r0", "b.py", "c1", "python", "   "),               # dead: whitespace only
        ("r0", "c.py", "c1", "python", "# module: m2\ny"),
    ]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = normalize_corpus(files).collect()
    got = {(r.path, r.commit) for r in out}
    assert got == {("a.py", "c1"), ("c.py", "c1")}


def test_contracted_graph_bound_enforced(spark):
    """critical_path / chain_decomposition refuse inputs above their
    contracted-graph size bound with a clear error (the documented
    contract is now mechanical, r2 VERDICT #8)."""
    import pytest

    from cim_framework_graph_partitioning_spark.operators.dag import (
        chain_decomposition,
        critical_path,
    )

    big = spark.range(600).selectExpr(
        "id AS src_id", "id + 1 AS dst_id", "1.0 AS weight"
    )
    with pytest.raises(ValueError, match="contracted-graph"):
        critical_path(spark, big, max_vertices=500)
    with pytest.raises(ValueError, match="contracted-graph"):
        chain_decomposition(spark, big, max_vertices=500)
    # at/under the bound still works
    small = spark.range(5).selectExpr(
        "id AS src_id", "id + 1 AS dst_id", "1.0 AS weight"
    )
    assert critical_path(spark, small, max_vertices=500) == [0, 1, 2, 3, 4, 5]


def test_topological_levels_aqe_off(spark):
    """Regression: with adaptive execution disabled, the peel's frontier
    used to carry lineage to a checkpoint another barrier had already
    released — any cache bypass then recomputed through the released
    RDD and died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. The frontier is
    now lineage-free (its own checkpoint), so the peel must be correct
    under any session conf."""
    from cim_framework_graph_partitioning_spark.operators.dag import (
        topological_levels,
    )

    was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pairs = [(i, i + 1) for i in range(6)] + [(10, 11), (11, 12)]
        e = spark.createDataFrame(
            [(u, v, 1.0) for u, v in pairs],
            "src_id long, dst_id long, weight double",
        )
        lv = {r.id: r.level for r in topological_levels(spark, e).collect()}
        assert lv == {i: i for i in range(7)} | {10: 0, 11: 1, 12: 2}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", was)
