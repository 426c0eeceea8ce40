"""CLI entry point — run via spark-submit:

  spark-submit --py-files <(zip of cim_framework_graph_partitioning_spark) \\
      main.py --algo pagerank --input /path/corpus_parquet --output /path/out \\
      [--tol 1e-6] [--max-iter 200] [--checkpoint-dir /path/ck] [--resume] [--k 8]

Mirrors the reference's CLI dispatch (run.py:11-65: strategy → mode) as
an --algo dispatch over the engine's algorithms. Input is either a
corpus table (repo, path, commit, lang, content) — edges derived — or a
ready edge table (src_id, dst_id, weight), auto-detected by schema.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession

from cim_framework_graph_partitioning_spark.operators.components import (
    connected_components,
)
from cim_framework_graph_partitioning_spark.operators.edges import (
    assert_content_integrity,
    derive_edges,
)
from cim_framework_graph_partitioning_spark.operators.labelprop import (
    label_propagation,
)
from cim_framework_graph_partitioning_spark.operators.normalize import normalize_corpus
from cim_framework_graph_partitioning_spark.operators.pagerank import pagerank
from cim_framework_graph_partitioning_spark.operators.partitioner import (
    balanced_partition,
)
from cim_framework_graph_partitioning_spark.operators.triangles import triangle_count
from cim_framework_graph_partitioning_spark.session import get_spark

ALGOS = ("pagerank", "pagerank_csr", "cc", "lpa", "triangles", "partition", "edges")


def load_edges(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    cols = set(df.columns)
    if {"src_id", "dst_id", "weight"} <= cols:
        return df
    if {"repo", "path", "commit", "lang", "content"} <= cols:
        files = normalize_corpus(df)
        g = derive_edges(files)
        assert_content_integrity(files, g.vertices)
        return g.edges
    raise SystemExit(f"unrecognized input schema: {sorted(cols)}")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True, choices=ALGOS)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"cim-linkgraph-{args.algo}")
    edges = load_edges(spark, args.input)

    if args.algo in ("pagerank", "pagerank_csr"):
        out, steps = pagerank(
            spark, edges, damping=args.damping, tol=args.tol,
            max_iter=args.max_iter,
            mode="csr" if args.algo == "pagerank_csr" else "dataframe",
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
        print(f"pagerank converged in {steps} supersteps", file=sys.stderr)
    elif args.algo == "cc":
        out, _ = connected_components(
            spark, edges, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
    elif args.algo == "lpa":
        out, _ = label_propagation(
            spark, edges, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )
    elif args.algo == "triangles":
        out = triangle_count(edges)
    elif args.algo == "partition":
        out, history = balanced_partition(
            spark, edges, k=args.k, max_rounds=args.max_iter
        )
        print(f"partition history: {history}", file=sys.stderr)
    else:  # edges
        out = edges

    out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
