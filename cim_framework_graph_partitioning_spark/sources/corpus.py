"""Deterministic synthetic source-code corpus (the engine's input table).

Schema mandated by BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Models the reference's raw input — the ONNX node list whose tensor names
define the dependency graph (reference: read_file.py:8-13, graph.py:7-24).
Each file's ``content`` embeds a module declaration and ``import`` lines
naming other modules; imports are drawn from a power-law popularity
distribution so hub files exist and the skew-handling paths are exercised.

Generation is **fully columnar** (spark.range + deterministic hash
arithmetic), so the same code synthesizes 50 files locally or 10^12 files
on a 1000-executor cluster with no driver-side data and no Python in the
row path. Determinism: all pseudo-randomness is ``xxhash64(id, k, seed)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_MOD = 2**31


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hashed columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(HASH_MOD))) / F.lit(float(HASH_MOD))


def synthesize_corpus(
    spark: SparkSession,
    n_files: int,
    n_repos: int = 20,
    seed: int = 42,
    max_imports: int = 15,
    hub_exponent: float = 3.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return the ``files`` DataFrame (repo, path, commit, lang, content).

    Import targets are ``floor(n_files * u^hub_exponent)`` — density
    concentrates near file 0, giving a power-law in-degree with a
    max-degree hub at module 0 (exercises salting / AQE skew handling).
    """
    base = spark.range(0, n_files, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    repo_idx = (i * n_repos / F.lit(n_files)).cast("long")
    repo = F.format_string("repo_%04d", repo_idx)
    path = F.format_string("src/m%07d.py", i)
    module = F.format_string("mod_%07d", i)
    n_imports = (F.pmod(F.xxhash64(i, F.lit(seed), F.lit("n_imp")), F.lit(max_imports)) + 1).cast("int")

    # import target for draw k: power-law toward low ids; never self.
    def target(k: F.Column) -> F.Column:
        u = _u01(i, k, F.lit(seed), F.lit("tgt"))
        t = F.floor(F.pow(u, F.lit(hub_exponent)) * F.lit(n_files)).cast("long")
        t = F.least(t, F.lit(n_files - 1))
        return F.when(t == i, F.pmod(t + 1, F.lit(n_files))).otherwise(t)

    import_lines = F.transform(
        F.sequence(F.lit(0), n_imports - 1),
        lambda k: F.format_string("import mod_%07d", target(k)),
    )
    header = F.format_string("# module: mod_%07d", i)
    body = F.concat(
        F.lit("def main():\n    return "),
        F.conv(F.hex(F.abs(F.xxhash64(i, F.lit(seed), F.lit("body")))), 16, 10),
    )
    content = F.concat_ws("\n", header, F.concat_ws("\n", import_lines), body)
    commit = F.substring(F.sha2(F.concat(repo, path, F.lit("v1")), 256), 1, 40)

    return base.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.lit("python").alias("lang"),
        content.alias("content"),
    )


def synthesize_corpus_modular(
    spark: SparkSession, n_files: int = 500, n_repos: int = 10
) -> DataFrame:
    """SQL-reproducible corpus variant for the edge-derivation oracle.

    Same schema/content shape as ``synthesize_corpus`` but every
    pseudo-random draw is plain modular arithmetic (no xxhash64), so a
    DuckDB query can regenerate the IDENTICAL corpus and replicate the
    symbol-extraction regexes + equi-join bit-for-bit (queries.py
    ``corpus_edges``). File i defines mod_i, imports the hub mod_0 plus
    (i mod 7)+1 modular targets — hub weight-2 edges and self-import
    filtering both occur, so the aggregation and self-edge paths are
    exercised, not just the join."""
    base = spark.range(n_files)
    i = F.col("id")
    import_lines = F.transform(
        F.sequence(F.lit(0), F.pmod(i, F.lit(7)).cast("int")),
        lambda k: F.format_string(
            "import mod_%07d", F.pmod(i * 31 + k * 17 + 1, F.lit(n_files))
        ),
    )
    content = F.concat_ws(
        "\n",
        F.format_string("# module: mod_%07d", i),
        F.lit("import mod_0000000"),
        F.concat_ws("\n", import_lines),
        F.lit("def main():\n    return 0"),
    )
    repo = F.format_string("repo_%04d", F.pmod(i, F.lit(n_repos)))
    path = F.format_string("src/m%07d.py", i)
    return base.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(repo, path, F.lit("v1")), 256), 1, 40).alias("commit"),
        F.lit("python").alias("lang"),
        content.alias("content"),
    )


def write_corpus(files: DataFrame, out_dir: str) -> None:
    """Persist the corpus (parquet; Iceberg layout when the connector is
    on the classpath — parquet is the functional fallback, same DataFrame
    surface)."""
    files.write.mode("overwrite").parquet(out_dir)
