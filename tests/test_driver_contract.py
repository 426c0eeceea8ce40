"""Driver-contract sanity: entry() + a sample of queries() vs oracles.

The full 25-oracle sweep runs via scripts/check_oracles.py (slow); this
pytest samples cheap representatives of each family at sf0.001 so the
gate stays fast while covering the contract plumbing end-to-end.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from cim_framework_graph_partitioning_spark.sources.tables import TABLES

SF = "/root/testdata/sf0.001"
SAMPLE = [
    "top_depended_parts",
    "pagerank_3steps",
    "triangle_count",
    "pricing_summary",
    "events_sessions",
    "doc_token_stats",
    "embedding_topk",
    # the recursive-CTE hill-climb replica (the last former rows-only
    # entry) — cheap at sf0.001 (10 suppliers) but exercises the whole
    # candidate/coloring/acceptance unroll
    "balanced_partition",
    # multimodal kernel plumbing vs the DuckDB hex-arithmetic replica
    "media_features",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert set(df.columns) == {"part_vertex", "in_weight", "in_degree"}


def test_every_query_has_callable_and_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 20  # SQL-checkable majority


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_duckdb_oracle(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(oracles[name])
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(res.columns)
    assert len(srows) == len(drows)
    assert _rows(sdf.columns, srows) == _rows(res.columns, drows)
