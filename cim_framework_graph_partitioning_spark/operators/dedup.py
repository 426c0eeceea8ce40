"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame dataflow (JVM expressions + shuffles);
each returns results keyed so a downstream anti-join removes dupes.
Scale notes per operator below — the shapes are the standard
MapReduce-style dedup pipelines (shingle → minhash → band → bucket
join), which shard by construction.

No reference precedent (the reference deduplicates nothing); these are
the training-data-pipeline extensions required alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



# --- exact ---------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup. Returns (doc_id, canonical_id) for every
    duplicate row (canonical = min id per identical text). One shuffle on
    the 256-bit content hash; trivially sharded at any scale."""
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("_h")
    )
    canon = h.groupBy("_h").agg(F.min("doc_id").alias("canonical_id"))
    return (
        h.join(canon, "_h")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


# --- shingling ------------------------------------------------------------

def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """(doc_id, shingle) — word n-grams per document, distinct by
    default (set semantics for Jaccard). ``distinct=False`` skips the
    dedup shuffle for consumers that are duplicate-insensitive (a
    min-hash over a multiset equals the min-hash over its support)."""
    toks = tokens_col(text_col)
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark
    # (inferred step -1) and crash slice; docs shorter than n words have
    # no shingles — emit NULL, which explode drops.
    # (r6 note: an element_at-per-token variant was measured 2x SLOWER
    # than slice at bench scale — ANSI bounds checks per access beat the
    # slice copies at realistic doc lengths; keep slice.)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    )
    out = docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


# --- n-gram Jaccard -------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity via shingle inverted index:
    pairs sharing ≥1 shingle get sim = |A∩B| / |A∪B|. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, filtered to ≥ threshold.

    ``max_doc_freq``: document-frequency cap on shingles. Shingles that
    appear in more than this many documents are dropped BEFORE the
    self-join — from both the intersection and the union (Jaccard is
    computed over the capped shingle space; a shared ultra-common
    shingle carries no dedup signal). This is what makes the inverted
    index scale: without it a stop-shingle hub turns the self-join
    near-cartesian (one groupBy(shingle) pass bounds every join key's
    fan-out at max_doc_freq², independent of corpus size).
    """
    sh = shingles(docs, n, id_col, text_col)
    if max_doc_freq is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = (
            sh.join(dfreq.filter(F.col("_df") <= max_doc_freq), "shingle")
            .select("doc_id", "shingle")
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH ----------------------------------------------------------

def _perm_hash(i: int, seed: int, hash_family: str) -> F.Column:
    """Permutation-i hash of the ``shingle`` column.

    * "xxhash64" (default): xxhash64(shingle, seed+i) — fastest, JVM-only.
    * "md5": first 60 bits of md5(f"{seed+i}:{shingle}") as a long —
      bit-reproducible in ANSI SQL engines (DuckDB:
      CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)), which is what
      makes the driver's minhash oracle exactly checkable.
    """
    if hash_family == "xxhash64":
        return F.xxhash64(F.col("shingle"), F.lit(seed + i))
    if hash_family == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed + i}:"), F.col("shingle"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"unknown hash_family {hash_family!r}")


def minhash_signatures(
    docs: DataFrame, k: int = 32, n: int = 3, seed: int = 42,
    id_col: str = "doc_id", text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, pos, minhash) — k-permutation MinHash over word n-grams.

    Permutation i = hash_i(shingle) — k independent JVM-side hashes
    (affine-over-one-base families mix too weakly: a single unlucky
    global-min shingle correlates every position); see ``_perm_hash``
    for the families. The k hashes are emitted as one array column and
    pos-exploded, so the min per (doc, pos) is a single
    map-side-combined aggregation — no per-row Python, shards at any
    scale. A numpy applyInPandas kernel is the documented fast path if
    k grows large.
    """
    # distinct=False: the min per (doc, pos) is duplicate-insensitive,
    # so the signature path skips the shingle-dedup shuffle entirely
    # (the map-side partial min absorbs any repeats)
    sh = shingles(docs, n, id_col, text_col, distinct=False)
    hashes = F.array(*[_perm_hash(i, seed, hash_family) for i in range(k)])
    exploded = sh.select("doc_id", F.posexplode(hashes).alias("pos", "h"))
    return exploded.groupBy("doc_id", "pos").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    docs: DataFrame, k: int = 32, bands: int = 8, n: int = 3, seed: int = 42,
    id_col: str = "doc_id", text_col: str = "text",
    hash_family: str = "xxhash64",
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the k-element signature into ``bands``
    bands of k/bands values; docs sharing any band bucket become
    candidates. Returns distinct (doc_a, doc_b), doc_a < doc_b.

    The signature is built as ONE wide aggregation (k min-columns per
    doc) instead of posexplode + groupBy(doc, pos): the former k-fold
    row amplification and its (doc, pos) shuffle collapse into a single
    map-side-combined exchange of one row per document (guide §2.3:
    aggregate before you shuffle). The bucket is xxhash64 over the
    band's signature values — equal buckets iff equal band signatures
    (modulo the same ~2^-64 bucket-hash collision the string-form
    bucket had; the oracle compares band signatures by VALUE, so the
    internal bucket encoding is free to change)."""
    r = k // bands
    sh = _shingles if _shingles is not None else shingles(
        docs, n, id_col, text_col, distinct=False
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(_perm_hash(i, seed, hash_family)).alias(f"_h{i}")
            for i in range(k)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.lit(b), *[F.col(f"_h{b * r + j}") for j in range(r)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    # MATERIALIZED (localCheckpoint, not persist: a persist would be
    # plan-equality-matched by the cache manager and silently reused by
    # a later identical call — cross-run caching the round contract
    # forbids; a checkpoint is call-local): both self-join legs below
    # read the same banded table, which otherwise re-evaluates the whole
    # shingle→signature subtree per leg.
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_bb")
    ).select(
        "doc_id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    ).localCheckpoint(eager=True)
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame, threshold: float = 0.7, k: int = 32, bands: int = 8,
    n: int = 3, seed: int = 42, id_col: str = "doc_id", text_col: str = "text",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard ≥ threshold.
    Returns (doc_a, doc_b, jaccard)."""
    # ONE materialized distinct shingle table (localCheckpoint — see the
    # banded note in minhash_lsh_candidates for why not persist) feeds
    # BOTH the signature build (a min-hash over the distinct support
    # equals the min-hash over the multiset) and the Jaccard
    # verification (sizes + both intersection legs): the former plan
    # re-derived the shingle scan four times per run.
    sh = shingles(docs, n, id_col, text_col).localCheckpoint(eager=True)
    cands = minhash_lsh_candidates(
        docs, k, bands, n, seed, id_col, text_col, hash_family, _shingles=sh
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # equi-join on (doc_b, shingle): each candidate pair's intersection
    # is enumerated directly. The former doc_b-only join materialized
    # |sh(A)| x |sh(B)| rows per pair and filtered for equality after —
    # a per-pair quadratic blowup (guide §3.3: join on the full key,
    # don't explode then filter).
    inter = (
        cands.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------

def _simhash_nbits(hash_family: str) -> int:
    # md5 family yields 60-bit hashes (15 hex chars), xxhash64 full 64
    return 64 if hash_family == "xxhash64" else 60


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            hash_family: str = "xxhash64") -> DataFrame:
    """SimHash per document, entirely in JVM expressions:
    tokens → hash → per-bit ±count aggregation (one shuffle with
    map-side combine) → sign-bit reassembly. Returns (doc_id, simhash
    long). ``hash_family``: "xxhash64" (64-bit, default) or "md5"
    (60-bit, bit-reproducible in ANSI SQL — the oracle-checkable
    family, cf. _perm_hash)."""
    nbits = _simhash_nbits(hash_family)
    if hash_family == "xxhash64":
        h = F.xxhash64("tok")
    else:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    bits = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(nbits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return bits.select("doc_id", sim.alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id", text_col: str = "text",
                            hash_family: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found via the
    standard block trick: split the bits into (max_hamming+1) blocks —
    any pair within distance shares at least one exact block; join on
    (block_idx, block_value), verify with bit_count(xor)."""
    nblocks = max_hamming + 1
    width = _simhash_nbits(hash_family) // nblocks
    sh = simhash(docs, id_col, text_col, hash_family)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                )
                for i in range(nblocks)
            ])
        ).alias("blk", "blk_val"),
    )
    a = blocks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "blk", "blk_val")
    b = blocks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "blk", "blk_val")
    pairs = (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- embedding near-dup -------------------------------------------------------

def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 10, n_tables: int = 8, seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    ``method="lsh"`` (default) — multi-table hyperplane LSH bucketing
    (similarity.lsh_near_duplicates): every join is an equi-join on
    (table, bucket); this is the path that scales. Deterministic given
    the seed, so exactly reproducible (and SQL-oracle-checkable).

    ``method="exact"`` — brute all-pairs (O(n²) non-equi join). TEST
    ORACLE ONLY: it verifies LSH recall on planted near-dups in the
    test suite; never register or bench this path.
    """
    if method == "lsh":
        from .similarity import lsh_near_duplicates

        return lsh_near_duplicates(
            embeddings, threshold=threshold, n_planes=n_planes,
            n_tables=n_tables, seed=seed, dim=dim,
            id_col=id_col, vec_col=vec_col,
        )
    from ..functions.vectors import cosine

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")).alias("cos")
    ).filter(F.col("cos") >= threshold)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    max_chars: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every character k-gram, slide a ``window`` of
    consecutive gram hashes, keep each window's minimum — the selected
    set is a deterministic O(1/window)-density sketch with the guarantee
    that any match of length >= k + window - 1 shares a fingerprint.
    Returns (doc_id, fingerprint) distinct — the inverted-index input
    for copy/plagiarism detection and containment dedup (MinHash next
    door estimates resemblance; winnowing catches CONTAINMENT, which
    resemblance misses for small-in-large copies).

    All JVM-side: one higher-order-function pass per row builds the gram
    hash array (``transform`` over ``sequence``), a second builds the
    window minima (``array_min`` over ``slice``), then explode +
    distinct — one shuffle total. The gram hash is the md5-prefix
    bigint (same cross-engine hash bridge as walks.py: DuckDB computes
    the identical value, so fingerprints compare bit-exactly across
    engines). Hashing each gram independently is O(k) per gram vs the
    paper's O(1) rolling update — a constant-factor CPU tradeoff for
    whole-stage-codegen expressions instead of a Python UDF; ``max_chars``
    truncates pathological rows (the 100-TB knob: per-row work is
    bounded by max_chars * k, and one giant document cannot stall its
    partition)."""
    txt = F.col(text_col)
    if max_chars is not None:
        txt = F.substring(txt, 1, max_chars)
    n_grams = F.length(txt) - F.lit(k - 1)
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(txt, i, F.lit(k))), 1, 15), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    n_wins = F.size(F.col("_grams")) - F.lit(window - 1)
    mins = F.when(
        n_wins >= 1,
        F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.array_min(F.slice(F.col("_grams"), j, window)),
        ),
    ).otherwise(F.col("_grams"))  # shorter than a window: keep all grams
    return (
        docs.select(F.col(id_col).alias("doc_id"), grams.alias("_grams"))
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fingerprint"))
        .distinct()
    )


def dedup_keep_canonical(docs: DataFrame, dup_pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Remove every doc that appears as the larger id of a dup pair
    (connected-components-free greedy: keeps at least one per group)."""
    losers = dup_pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def near_dup_clusters(spark, docs: DataFrame, dup_pairs: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Group near-duplicates into CLUSTERS: connected components over the
    verified pair graph, canonical representative = min doc id per
    cluster. The standard keep-one-per-cluster dedup step — unlike the
    greedy pairwise drop (``dedup_keep_canonical``), transitive chains
    a~b, b~c land in ONE cluster even when (a, c) was never a candidate
    pair, so "keep canonical" removes exactly cluster_size - 1 docs.

    Returns (doc_id, cluster_id, cluster_size, is_canonical) for EVERY
    doc; singletons get their own cluster of size 1.

    Scale: the CC iteration runs on the pair graph only (≪ corpus — at
    web scale near-dup pairs are a few % of docs); the corpus-sized work
    is one left join against the labels and one groupBy on cluster_id.
    Both shuffles are on the doc-id/cluster-id keys they aggregate by.

    The pair graph is MATERIALIZED once (localCheckpoint) before the CC
    fixpoint: dup_pairs is typically the whole candidate-generation
    pipeline (shingle→signature→band-join→verify), and the iterative
    loop issues several actions (block sizing, vertex cache, per-round
    convergence checks) that would otherwise each replay that pipeline
    from the parquet scan up — measured 131s → ~14s at sf0.01. Eager
    materialization is safe at scale because the pair set is small by
    construction (the same contract that makes the CC loop cheap).
    """
    from .components import connected_components
    from ..plans.barrier import release_checkpoint

    edges = dup_pairs.select(
        F.col("doc_a").alias("src_id"), F.col("doc_b").alias("dst_id")
    ).localCheckpoint(eager=True)
    labels, _ = connected_components(spark, edges, run_id="dedup_cc")
    # labels is eagerly checkpointed inside connected_components, so the
    # pair-graph materialization has served its purpose — release it
    # rather than pin it for the session.
    release_checkpoint(edges)
    lab = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def curate_corpus(
    spark,
    docs: DataFrame,
    keep_lang: str = "en",
    min_quality: float = 0.6,
    jaccard_threshold: float = 0.4,
    minhash_k: int = 32,
    minhash_bands: int = 16,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The composed training-corpus curation pipeline: language-ID gate
    -> quality gate -> exact dedup (keep min id per sha256) -> minhash
    near-dup clusters (keep the min-id representative per cluster).
    Returns the curated set (doc_id, quality, n_tokens).

    Each stage strictly shrinks what the next touches: stages 1-2 are
    JVM expressions fused into the scan, stage 3 is one shuffle on the
    content hash, stage 4 generates candidates over the survivors only
    and iterates connected components over the pair graph only — the
    plan a 100-TB curation run needs (never score, hash, or shingle a
    document that an earlier stage already discarded).
    """
    from ..functions.text import lang_id, quality_score, token_count

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        lang_id(text_col).alias("pred_lang"),
        F.round(quality_score(text_col), 6).alias("quality"),
        token_count(text_col).alias("n_tokens"),
    )
    kept = (
        scored.filter(
            (F.col("pred_lang") == keep_lang)
            & (F.col("quality") >= min_quality)
        )
        # materialized once: the near-dup stage issues several actions
        # (pair verify, CC block sizing, per-round convergence checks)
        # that would otherwise each replay the scoring scan
        .localCheckpoint(eager=True)
    )
    kept = kept.join(exact_duplicates(kept), "doc_id", "left_anti")
    pairs = minhash_near_duplicates(
        kept, threshold=jaccard_threshold, k=minhash_k, bands=minhash_bands,
        hash_family=hash_family,
    )
    clusters = near_dup_clusters(spark, kept, pairs)
    dropped = clusters.filter(~F.col("is_canonical")).select("doc_id")
    return (
        kept.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "quality", "n_tokens")
    )
