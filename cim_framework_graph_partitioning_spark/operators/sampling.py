"""Deterministic sampling for training-data pipelines.

Hash-threshold Bernoulli sampling: a row is kept iff
``hash(id, seed) mod 2^31 < floor(fraction * 2^31)``. The decision is a
pure function of (id, seed) — reproducible across runs, engines,
partitionings, and cluster sizes, and STABLE under corpus growth (a doc
keeps its fate when new docs arrive — the property random-split
sampling lacks, and the reason training pipelines pin holdout sets this
way). Map-only: no shuffle, no RNG state, fully codegen'd.

``stratified_sample`` applies a per-stratum fraction map (e.g. language
rebalancing: downsample English, keep all low-resource strata) as one
literal CASE expression. Strata absent from the map default to fraction
0.0 (dropped) so a typo'd stratum never silently passes everything.

hash_family: xxhash64 (default) or md5 (bit-reproducible in DuckDB —
the same hash-family-parameterization the minhash/walks/MIS oracles
use).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 2**31


def _unit_hash(seed: int, id_col: str, hash_family: str) -> Column:
    """Non-negative hash of (seed, id) in [0, 2^31)."""
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(_MOD))
    if hash_family == "md5":
        s = F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        return F.pmod(h, F.lit(_MOD))
    raise ValueError(f"unknown hash_family {hash_family!r}")


def sample_fraction(
    docs: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample of ~fraction of the rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(fraction * _MOD)
    return docs.filter(_unit_hash(seed, id_col, hash_family) < F.lit(thresh))


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling. Unknown strata are dropped."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    thresh: Column = F.lit(0)
    for s, f in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(int(f * _MOD))).otherwise(
            thresh
        )
    return docs.filter(_unit_hash(seed, id_col, hash_family) < thresh)


def sample_oracle_keep(seed: int, doc_id: int, fraction: float) -> bool:
    """Pure-python replay of the md5-family decision (for tests)."""
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    return (h % _MOD) < int(fraction * _MOD)
