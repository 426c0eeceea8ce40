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

# Language rotation for the mixed-language corpus: file i is written in
# LANG_SPECS[i % 6]. Each spec = (lang, path extension, header comment
# prefix). Import-line syntax per language lives in _import_line; the
# module NAMESPACE is shared (file i defines mod_i regardless of
# language), mirroring how the reference's tensor-name equi-join is
# language-agnostic (reference: graph.py:12-23).
LANG_SPECS = (
    ("python", "py", "# "),
    ("c", "c", "// "),
    ("go", "go", "// "),
    ("javascript", "js", "// "),
    ("java", "java", "// "),
    ("rust", "rs", "// "),
)
_LANG_ARR = [l for l, _, _ in LANG_SPECS]
_EXT_ARR = [e for _, e, _ in LANG_SPECS]
_CMT_ARR = [c for _, _, c in LANG_SPECS]


def _pick(idx: F.Column, values: list[str]) -> F.Column:
    """values[idx] as a columnar expression (element_at is 1-based)."""
    return F.element_at(F.array(*[F.lit(v) for v in values]), idx + 1)


def _import_line(lang_idx: F.Column, k: F.Column, modname: F.Column) -> F.Column:
    """The language-idiomatic line referencing ``modname`` (draw k is
    only used by javascript, which alternates ESM import / CJS require
    so both extraction branches are exercised)."""
    js = F.when(
        F.pmod(k, F.lit(2)) == 0,
        F.format_string("import x%s from '%s'", k.cast("string"), modname),
    ).otherwise(
        F.format_string("const x%s = require('%s')", k.cast("string"), modname)
    )
    return (
        F.when(lang_idx == 0, F.concat(F.lit("import "), modname))
        .when(lang_idx == 1, F.concat(F.lit('#include "'), modname, F.lit('"')))
        .when(lang_idx == 2, F.concat(F.lit('import "'), modname, F.lit('"')))
        .when(lang_idx == 3, js)
        .when(lang_idx == 4, F.concat(F.lit("import "), modname, F.lit(";")))
        .otherwise(F.concat(F.lit("use "), modname, F.lit(";")))
    )


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
    lang_idx = F.pmod(i, F.lit(len(LANG_SPECS))).cast("int")
    path = F.concat(F.format_string("src/m%07d.", i), _pick(lang_idx, _EXT_ARR))
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
        lambda k: _import_line(lang_idx, k, F.format_string("mod_%07d", target(k))),
    )
    header = F.concat(_pick(lang_idx, _CMT_ARR), F.lit("module: "), module)
    body = F.concat(
        _pick(lang_idx, _CMT_ARR),
        F.lit("body: "),
        F.conv(F.hex(F.abs(F.xxhash64(i, F.lit(seed), F.lit("body")))), 16, 10),
    )
    content = F.concat_ws("\n", header, F.concat_ws("\n", import_lines), body)
    commit = F.substring(F.sha2(F.concat(repo, path, F.lit("v1")), 256), 1, 40)

    return base.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        _pick(lang_idx, _LANG_ARR).alias("lang"),
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
    ``corpus_edges``). File i is written in LANG_SPECS[i % 6] (all six
    supported languages, each with its idiomatic import syntax over the
    shared mod_* namespace), defines mod_i, and imports the hub mod_0
    plus (i mod 7)+1 modular targets — hub weight-2 edges and
    self-import filtering both occur, so the aggregation and self-edge
    paths are exercised, not just the join."""
    base = spark.range(n_files)
    i = F.col("id")
    lang_idx = F.pmod(i, F.lit(len(LANG_SPECS))).cast("int")
    import_lines = F.transform(
        F.sequence(F.lit(0), F.pmod(i, F.lit(7)).cast("int")),
        lambda k: _import_line(
            lang_idx,
            k,
            F.format_string("mod_%07d", F.pmod(i * 31 + k * 17 + 1, F.lit(n_files))),
        ),
    )
    content = F.concat_ws(
        "\n",
        F.concat(_pick(lang_idx, _CMT_ARR), F.format_string("module: mod_%07d", i)),
        _import_line(lang_idx, F.lit(-1), F.lit("mod_0000000")),
        F.concat_ws("\n", import_lines),
        F.concat(_pick(lang_idx, _CMT_ARR), F.lit("body: 0")),
    )
    repo = F.format_string("repo_%04d", F.pmod(i, F.lit(n_repos)))
    path = F.concat(F.format_string("src/m%07d.", i), _pick(lang_idx, _EXT_ARR))
    return base.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(repo, path, F.lit("v1")), 256), 1, 40).alias("commit"),
        _pick(lang_idx, _LANG_ARR).alias("lang"),
        content.alias("content"),
    )


def write_corpus(files: DataFrame, out_dir: str) -> None:
    """Persist the corpus (parquet; Iceberg layout when the connector is
    on the classpath — parquet is the functional fallback, same DataFrame
    surface)."""
    files.write.mode("overwrite").parquet(out_dir)
