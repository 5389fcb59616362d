"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training corpus carries images/audio/video as `binary` columns
with struct metadata. The Spark-side machinery — schema, partition-safe
batch iteration, Arrow-batched UDF signatures — is real and tested here;
the *codec* step (actual JPEG/audio decode) is stubbed because the
image/audio libraries aren't in this container. Each stub is clearly
marked and isolated behind one function so swapping in PIL/torchaudio
touches nothing else.

Design rules encoded here:
- decode/feature work runs in ``mapInPandas`` (arrow batches, one Python
  worker pass per partition, no per-row serialization);
- binary payloads NEVER enter a shuffle: features are extracted first,
  payload dropped, THEN grouped/joined;
- deterministic fake payloads derive from doc text (md5 stream), so the
  pipeline is testable end-to-end without media libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hoopstat_haus_spark.operators.common import load

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("first16_hex", T.StringType(), False),
    ]
)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from `documents`: payload =
    md5 keystream of the text, sized by n_chars. Real plumbing, fake
    bytes."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("text"),
        F.col("n_chars"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for text, n in zip(b["text"], b["n_chars"]):
                seed = hashlib.md5(text.encode()).digest()
                reps = int(n) // 16 + 1
                payloads.append((seed * reps)[: int(n)])
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "payload": payloads,
                    "meta": [
                        {"width": int(n) % 640, "height": int(n) % 480, "n_bytes": int(n)}
                        for n in b["n_chars"]
                    ],
                }
            )

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real implementation: PIL.Image.open(io.BytesIO(payload)).
    The container ships no imaging libs; the Spark plumbing around this
    is real and tested with deterministic fake payloads."""
    raise NotImplementedError("image decode requires PIL/opencv — not in this container")


def sample_video_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """STUB — real implementation: pyav/ffmpeg frame iterator."""
    raise NotImplementedError("video decode requires pyav/ffmpeg — not in this container")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the shape
    every real decode job takes: mapInPandas, payload consumed inside the
    worker, only small features leave (payload never shuffles)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ent, hexes, sizes = [], [], []
            for p in b["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                probs = counts[counts > 0] / len(arr)
                ent.append(float(-(probs * np.log2(probs)).sum()))
                hexes.append(arr[:16].tobytes().hex())
                sizes.append(len(arr))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "n_bytes": sizes,
                    "byte_entropy": ent,
                    "first16_hex": hexes,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(feats, schema=FEATURE_SCHEMA)


def media_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: synth media → extract → rollup per media_type.

    Oracle-able because the fake payload is a pure function of `text`:
    n_bytes = n_chars and first16 = md5(text) — the entropy stays
    Spark-side (numpy) and is aggregated with stable rounding."""
    feats = extract_features(synthetic_media(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(
                F.sum(F.col("byte_entropy").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
                + F.lit(1e-9),
                4,
            ).alias("avg_entropy"),
            F.countDistinct("first16_hex").alias("distinct_heads"),
        )
        .orderBy("media_type")
    )


ORACLE = {
    # entropy is numpy-side; oracle checks the SQL-derivable facets and a
    # weaker bound on entropy via NULL — instead we check everything that
    # IS derivable: counts, byte totals, distinct md5 heads.
    "mm_media_feature_rollup_facets": """
        SELECT media_type, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               COUNT(DISTINCT substr(md5(text), 1, 32)) AS distinct_heads
        FROM (
          SELECT doc_id, text, n_chars,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS media_type
          FROM documents
        ) GROUP BY media_type ORDER BY media_type
    """,
}


def media_feature_rollup_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable facet of the media pipeline (drops the numpy-only
    entropy column; md5-keystream head == md5(text) hex)."""
    feats = extract_features(synthetic_media(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("first16_hex").alias("distinct_heads"),
        )
        .orderBy("media_type")
    )


QUERIES = {
    "mm_media_feature_rollup": media_feature_rollup,
    "mm_media_feature_rollup_facets": media_feature_rollup_facets,
}
