"""BM25 ranked retrieval over a document table.

Okapi BM25 with the guarded idf (ln(1 + (N - df + 0.5)/(df + 0.5)) —
always positive, the Lucene convention). Entirely built-in JVM
expressions: tokenize → explode → filter to the query terms → per-(doc,
term) tf → corpus statistics (df per query term, per-doc length, 1-row
avgdl/N aggregate kept IN-PLAN via a cross join, never collected) →
score → top-k.

Determinism: the per-document score sums one contribution per matched
query term. Floating-point addition is order-sensitive, so the sum is
folded over the term-sorted contribution array (``F.aggregate`` over
``sort_array(collect_list(...))``) — deterministic across partitionings
and bit-replayable by an oracle that sums in the same term order.

Scale shape: the exploded token table is filtered to the query's terms
BEFORE any shuffle (predicate on a literal array — Catalyst pushes it
below the explode's project), so the tf aggregation shuffles only
matching (doc, term) rows, not the corpus token stream. df and avgdl
are tiny aggregates; the final top-k is a global sort LIMIT k (Spark
executes TakeOrderedAndProject — per-partition heaps, no full sort).

No reference precedent (the reference ranks nothing); training-data
extension alongside dedup/quality scoring.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round6(x: float) -> float:
    """Spark's round() semantics on doubles (BigDecimal HALF_UP) —
    python's built-in round() is banker's rounding and differs on
    exact .5 boundaries."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query. Returns
    (doc_id, score) with score rounded to 6 decimals, ordered by
    (score desc, doc_id asc) — a total order, so ties are stable."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    ).filter(F.trim(F.col(text_col)) != "")
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))

    # 1-row corpus stats, kept in-plan (broadcast by AQE at join time)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    hit = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = hit.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    # order-deterministic fold: sum contributions in term order
    score = (
        scored.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )
    return score.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def bm25_oracle_rows(
    rows: list[tuple[int, str]],
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[int, float]]:
    """Pure-python replay (same tokenizer, same term-ordered fold) for
    tests: bit-exact including the rounding."""
    terms = sorted({t.lower() for t in query_terms})
    toks = {
        i: t.lower().strip().split() for i, t in rows if t.strip() != ""
    }
    n = float(len(toks))
    avgdl = sum(len(v) for v in toks.values()) / n
    dfc = {
        t: float(sum(1 for v in toks.values() if t in v)) for t in terms
    }
    out = []
    for i, v in toks.items():
        s = 0.0
        for t in terms:  # term-sorted fold, matching the engine
            tf = float(v.count(t))
            if tf == 0 or dfc[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
        if s > 0.0:
            out.append((i, _round6(s)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
