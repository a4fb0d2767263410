"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
over the binary payloads.  The decode step itself is STUBBED (the image and
audio codec libraries are not available in this container): `_decode_image`
raises NotImplementedError unless `deterministic_fake=True`, in which case
a seeded, content-derived fake decode keeps the whole distributed pipeline
(schema, batching, partitioning, UDF signatures) real and testable.

Scale notes: binary payloads dominate row size -> keep
`spark.sql.files.maxPartitionBytes` small for these tables, select the
binary column only in stages that need it (column pruning does the rest),
and emit features to a separate narrow table rather than carrying bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feat", ArrayType(FloatType())),
    StructField("feat_dim", IntegerType()),
])


def synthesize_media(spark, n_rows: int) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes of the id)."""
    df = spark.range(n_rows)
    i = F.col("id")
    kind = F.element_at(F.lit(["image", "audio", "video"]),
                        (F.pmod(i, F.lit(3)) + 1).cast("int"))
    payload = F.encode(F.sha2(F.concat(F.lit("media"), i.cast("string")), 512), "UTF-8")
    return df.select(
        i.alias("media_id"),
        F.concat(F.lit("https://cdn.example/m/"), i.cast("string")).alias("url"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.pmod(i * 37, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(i * 53, F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(i * 97, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
    )


def _decode_image(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """STUB: real decode needs an image codec (PIL/cv2 not in container)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires a codec library; pass deterministic_fake=True "
            "for the seeded fake decode used in tests/benchmarks")
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, deterministic_fake: bool = True,
                     batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: decode -> 12-dim color/entropy stats.

    Only (media_id, kind, payload) are read — let Catalyst prune the rest.
    """
    src = media.select("media_id", "kind", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = _decode_image(bytes(payload), deterministic_fake)
                px = img.reshape(-1, 3).astype(np.float64) / 255.0
                mean = px.mean(axis=0)
                std = px.std(axis=0)
                hist, _ = np.histogram(px.mean(axis=1), bins=6, range=(0, 1))
                feats.append(np.concatenate([mean, std, hist / len(px)]).astype(np.float32))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": [list(map(float, f)) for f in feats],
                "feat_dim": [len(f) for f in feats],
            })

    return src.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    The timestamp grid is pure JVM sequence/explode; the actual frame decode
    plugs into extract_features' stub point."""
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1,
                                         F.lit(every_ms))).alias("frame_ts_ms")))
