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
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

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
    """STUB: real decode needs an image codec (PIL/cv2 not in container).

    The deterministic fake derives an 8x8x3 "image" from an md5 chain over
    the payload — pure hash arithmetic, so any engine (incl. the DuckDB
    oracle) reproduces the exact pixel bytes."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires a codec library; pass deterministic_fake=True "
            "for the seeded fake decode used in tests/benchmarks")
    raw = b"".join(hashlib.md5(payload + b"_" + str(i).encode()).digest()
                   for i in range(12))
    return np.frombuffer(raw, dtype=np.uint8).reshape(8, 8, 3).copy()


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


MEDIA_STATS_SCHEMA = StructType(
    [StructField("media_id", LongType())]
    + [StructField(f"mean_{c}", DoubleType()) for c in "rgb"]
    + [StructField(f"std_{c}", DoubleType()) for c in "rgb"]
    + [StructField(f"h{b}", LongType()) for b in range(6)])


def media_stats(media: DataFrame, key_col: str = "media_id",
                payload_col: str = "payload",
                deterministic_fake: bool = True) -> DataFrame:
    """Per-media decoded-pixel stats: channel means/stds (rounded to 6) and
    a 6-bin histogram of integer pixel-channel sums (exact ints) — the
    oracle-checkable face of the decode -> feature pipeline.

    The histogram bins on the INTEGER sum of the 3 channel bytes
    (bin = sum3 // 128, sum3 in [0, 765] -> bins 0..5) so binning is exact
    arithmetic in every engine, immune to FP boundary flips."""
    src = media.select(key_col, payload_col)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[key_col], pdf[payload_col]):
                img = _decode_image(bytes(payload), deterministic_fake)
                px = img.reshape(-1, 3).astype(np.float64)
                scaled = px / 255.0
                mean = np.round(scaled.mean(axis=0), 6)
                std = np.round(scaled.std(axis=0), 6)
                bins = np.bincount(px.astype(np.int64).sum(axis=1) // 128,
                                   minlength=6)
                rows.append((mid, *mean, *std, *bins[:6]))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_STATS_SCHEMA])

    return src.mapInPandas(stats, schema=MEDIA_STATS_SCHEMA)


def media_stats_oracle_sql(src_sql: str, key_col: str = "media_id",
                           payload_col: str = "p") -> str:
    """DuckDB query reproducing media_stats for a source that yields the
    payload as a STRING column (md5 chain is computed on its UTF-8 text)."""
    mean_cols = ", ".join(
        f"max(CASE WHEN ch = {i} THEN m END) AS mean_{c}"
        for i, c in enumerate("rgb"))
    std_cols = ", ".join(
        f"max(CASE WHEN ch = {i} THEN s END) AS std_{c}"
        for i, c in enumerate("rgb"))
    hist_cols = ", ".join(
        f"coalesce(max(CASE WHEN bin = {b} THEN c END), 0) AS h{b}"
        for b in range(6))
    return f"""
WITH src AS ({src_sql}),
chains AS (SELECT {key_col}, i, md5({payload_col} || '_' || CAST(i AS VARCHAR)) AS h
           FROM src CROSS JOIN range(12) t(i)),
bytes AS (SELECT {key_col}, (i*16 + j) AS bi,
          ('0x' || substr(h, CAST(j*2 + 1 AS INT), 2))::BIGINT AS b
          FROM chains CROSS JOIN range(16) s(j)),
px AS (SELECT {key_col}, bi // 3 AS pix, bi % 3 AS ch, b FROM bytes),
chan AS (SELECT {key_col}, ch, round(avg(b/255.0), 6) AS m,
         round(stddev_pop(b/255.0), 6) AS s FROM px GROUP BY 1, 2),
pixsum AS (SELECT {key_col}, pix, sum(b) AS s3 FROM px GROUP BY 1, 2),
hist AS (SELECT {key_col}, least(s3 // 128, 5) AS bin, count(*) AS c
         FROM pixsum GROUP BY 1, 2),
chan_p AS (SELECT {key_col}, {mean_cols}, {std_cols} FROM chan GROUP BY 1),
hist_p AS (SELECT {key_col}, {hist_cols} FROM hist GROUP BY 1)
SELECT * FROM chan_p JOIN hist_p USING ({key_col})
"""


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    The timestamp grid is pure JVM sequence/explode; the actual frame decode
    plugs into extract_features' stub point."""
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1,
                                         F.lit(every_ms))).alias("frame_ts_ms")))
