"""BM25 ranking and deterministic sampling against pure-python replays."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cim_framework_graph_partitioning_spark.operators.ranking import (
    bm25_oracle_rows,
    bm25_topk,
)
from cim_framework_graph_partitioning_spark.operators.sampling import (
    sample_fraction,
    sample_oracle_keep,
    stratified_sample,
)

DOCS = [
    (0, "spark shuffles data across the cluster for the join"),
    (1, "a hash join beats a sort merge join on skewed data"),
    (2, "spark spark spark"),
    (3, "vector search over embeddings"),
    (4, ""),
    (5, "the quick brown fox"),
    (6, "hash hash vector spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_replay(spark, docs):
    q = ["spark", "hash", "vector"]
    got = [(r.doc_id, r.score) for r in bm25_topk(docs, q, k=5).collect()]
    assert got == bm25_oracle_rows(DOCS, q, k=5)
    assert got[0][0] in (2, 6)  # heavy-tf docs rank first


def test_bm25_tf_saturation(spark, docs):
    """BM25's tf saturation: tripling tf must NOT triple the score."""
    got = {r.doc_id: r.score for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert got[2] < 3 * got[0]
    assert got[2] > got[0]  # but more tf still scores higher


def test_bm25_empty_query_rejected(spark, docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_partitioning_invariant(spark, docs):
    q = ["join", "data"]
    a = bm25_topk(docs, q, k=10).collect()
    b = bm25_topk(docs.repartition(5), q, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_sample_fraction_matches_md5_replay(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    got = {r.doc_id for r in
           sample_fraction(df, 0.3, seed=9, hash_family="md5").collect()}
    want = {i for i in range(500) if sample_oracle_keep(9, i, 0.3)}
    assert got == want
    assert 0.2 < len(got) / 500 < 0.4  # rate sanity


def test_sample_stable_under_corpus_growth(spark):
    """A doc's fate is a pure function of (seed, id): growing the corpus
    never flips an existing doc's decision."""
    small = spark.range(100).select(F.col("id").alias("doc_id"))
    big = spark.range(1000).select(F.col("id").alias("doc_id"))
    kept_small = {r.doc_id for r in sample_fraction(small, 0.5, seed=1).collect()}
    kept_big = {r.doc_id for r in sample_fraction(big, 0.5, seed=1).collect()}
    assert kept_small == {i for i in kept_big if i < 100}


def test_stratified_sample_rates_and_unknown_dropped(spark):
    rows = [(i, ["en", "es", "xx"][i % 3]) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, "lang", {"en": 1.0, "es": 0.5}, seed=3)
    by_lang = {r["lang"]: r["n"] for r in
               got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == 300  # fraction 1.0 keeps everything
    assert 90 < by_lang.get("es", 0) < 210
    assert "xx" not in by_lang  # unmapped stratum dropped entirely


def test_sample_rejects_bad_fraction(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        sample_fraction(df, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(df.withColumn("s", F.lit("a")), "s", {"a": -0.1})


# --- KMV distinct sketch (operators/sketches.py) -------------------------

def _kmv_replay(values, k, seed):
    hs = sorted({int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
                 for v in values})
    if len(hs) < k:
        return len(hs), None, float(len(hs))
    kth = hs[k - 1]
    return k, kth, (k - 1) / ((kth + 1) / float(1 << 60))


def test_kmv_matches_md5_replay(spark):
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        kmv_distinct,
    )
    rows = [("a", f"v{i % 300}") for i in range(900)] + [
        ("b", f"w{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {r.grp: (r.n_hashes, r.kth_hash, r.est_distinct)
           for r in kmv_distinct(df, ["grp"], "v", k=64, seed=3,
                                 hash_family="md5").collect()}
    for grp, values in (("a", [f"v{i}" for i in range(300)]),
                        ("b", [f"w{i}" for i in range(40)])):
        n, kth, est = _kmv_replay(values, 64, 3)
        assert got[grp][0] == n, grp
        assert got[grp][1] == kth, grp
        assert got[grp][2] == pytest.approx(est, rel=1e-12), grp


def test_kmv_estimate_within_error_bound(spark):
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        kmv_distinct,
    )
    k, true_n = 256, 5000
    df = spark.createDataFrame([("g", f"item{i}") for i in range(true_n)],
                               "grp string, v string")
    est = kmv_distinct(df, ["grp"], "v", k=k, seed=1).collect()[0].est_distinct
    # standard error ~ 1/sqrt(k-2); allow 5 sigma
    assert abs(est - true_n) / true_n < 5 / (k - 2) ** 0.5


def test_kmv_salted_phases_match_single_window(spark):
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        kmv_distinct,
    )
    df = spark.createDataFrame([("g", f"x{i}") for i in range(500)],
                               "grp string, v string")
    a = kmv_distinct(df, ["grp"], "v", k=32, seed=7, salt_buckets=1).collect()
    b = kmv_distinct(df, ["grp"], "v", k=32, seed=7, salt_buckets=64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmv_merge_property(spark):
    # the sketch of a union equals the min-k merge of the two sketches:
    # estimate over A union B == estimate computed from union directly
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        kmv_distinct,
    )
    rows_a = [("g", f"a{i}") for i in range(200)]
    rows_b = [("g", f"b{i}") for i in range(200)]
    u = kmv_distinct(
        spark.createDataFrame(rows_a + rows_b, "grp string, v string"),
        ["grp"], "v", k=64, seed=5, hash_family="md5").collect()[0]
    n, kth, est = _kmv_replay([v for _, v in rows_a + rows_b], 64, 5)
    assert (u.n_hashes, u.kth_hash) == (n, kth)
    assert u.est_distinct == pytest.approx(est, rel=1e-12)


# --- HyperBall-KMV neighborhood sketches ---------------------------------

def _ball_replay(pairs, t, k, seed):
    """Python replay: exact min-k sketch fixpoint of the <=t-hop ball."""
    nbrs = {}
    for u, v in pairs:
        if u != v:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
    def h(v):
        return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
    sk = {v: [h(v)] for v in nbrs}
    for _ in range(t):
        sk = {v: sorted(set(sk[v]).union(*[sk[u] for u in nbrs[v]]))[:k]
              for v in nbrs}
    out = {}
    for v, s in sk.items():
        if len(s) >= k:
            kth = s[k - 1]
            out[v] = (len(s), kth, (k - 1) / ((kth + 1) / float(1 << 60)))
        else:
            out[v] = (len(s), None, float(len(s)))
    return out


def test_neighborhood_sketches_match_python_replay(spark):
    import random
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        neighborhood_sketches,
    )
    rng = random.Random(17)
    pairs = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(100)}
                   - {(i, i) for i in range(40)})
    df = spark.createDataFrame([(u, v, 1.0) for u, v in pairs],
                               "src_id long, dst_id long, weight double")
    got = {r.id: (r.n_sk, r.kth_hash, r.est_ball)
           for r in neighborhood_sketches(
               spark, df, t=2, k=8, seed=3, hash_family="md5").collect()}
    want = _ball_replay(pairs, 2, 8, 3)
    assert set(got) == set(want)
    for v, (n, kth, est) in want.items():
        assert got[v][0] == n, v
        assert got[v][1] == kth, v
        assert got[v][2] == pytest.approx(est, rel=1e-12), v


def test_neighborhood_sketches_exact_small_balls(spark):
    # path graph, k larger than any ball: n_sk IS the exact ball size
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        neighborhood_sketches,
    )
    p6 = [(i, i + 1, 1.0) for i in range(5)]
    df = spark.createDataFrame(p6, "src_id long, dst_id long, weight double")
    got = {r.id: r.n_sk for r in
           neighborhood_sketches(spark, df, t=2, k=32).collect()}
    # |Ball(v,2)| on P6: ends 3, next-to-ends 4, middle 5
    assert got == {0: 3, 1: 4, 2: 5, 3: 5, 4: 4, 5: 3}


def test_neighborhood_sketches_salt_invariant(spark):
    import random
    from cim_framework_graph_partitioning_spark.operators.sketches import (
        neighborhood_sketches,
    )
    rng = random.Random(23)
    pairs = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(70)}
                   - {(i, i) for i in range(25)})
    df = spark.createDataFrame([(u, v, 1.0) for u, v in pairs],
                               "src_id long, dst_id long, weight double")
    a = sorted(tuple(r) for r in neighborhood_sketches(
        spark, df, t=2, k=8, seed=1, salt_buckets=1).collect())
    b = sorted(tuple(r) for r in neighborhood_sketches(
        spark, df, t=2, k=8, seed=1, salt_buckets=64).collect())
    assert a == b
