"""End-to-end corpus curation pipeline (operators/dedup.py
curate_corpus): each stage must drop exactly the planted victims."""

from __future__ import annotations

from cim_framework_graph_partitioning_spark.operators.dedup import curate_corpus

_EN = (
    "the quick brown fox jumps over the lazy dog and it runs to the "
    "river in the morning for a drink of water that is cold and clear "
)


def _docs(spark):
    t1 = _EN * 5  # long, stopword-rich, punctuation-free: quality >= 0.6
    t1_near = t1.replace("brown", "grey").replace("lazy", "sleepy")
    t2 = (
        "a calm and steady wind moved over the hills to the sea and it "
        "carried the scent of rain that fell in the night for hours on end "
    ) * 5
    de = "der schnelle braune fuchs springt ueber den faulen hund " * 10
    junk = "!!! ??? ### $$$ %%% the !!! ??? ### $$$ %%% " * 12
    rows = [
        (1, t1),        # kept (canonical of both dup groups)
        (2, t1),        # exact duplicate of 1 -> dropped
        (3, t1_near),   # near duplicate of 1 -> clustered, dropped
        (4, de),        # no english stopwords -> lang gate drop
        (5, junk),      # punct_ratio tanks quality -> quality gate drop
        (6, t2),        # kept
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_drops_each_victim_class(spark):
    out = curate_corpus(spark, _docs(spark)).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 6]
    for r in out:
        assert r.quality >= 0.6
        assert r.n_tokens > 100


def test_curate_corpus_near_dup_keeps_min_id(spark):
    # same corpus but with the near-dup's id BELOW the original's:
    # the cluster representative must flip with it
    rows = [(0 if r.doc_id == 3 else r.doc_id, r.text)
            for r in _docs(spark).collect()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(spark, docs).orderBy("doc_id").collect()
    # exact-dup group {1, 2}: canonical 1; near-dup cluster {0, 1}: keep 0
    assert [r.doc_id for r in out] == [0, 6]
