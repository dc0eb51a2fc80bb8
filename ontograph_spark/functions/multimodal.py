"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns next to a
typed metadata struct; Spark never interprets the bytes. The decode /
feature-extract / resize / frame-sample operators are Arrow-batched
``mapInPandas`` stages whose *plumbing* (schema, partitioning, UDF
signature, batch shape) is real and tested — the codec calls themselves
are stubbed: this container ships no image/audio libraries, so decoding
raises ``NotImplementedError`` unless the deterministic fake decoder is
selected (the fake derives "pixels"/"samples" from the payload bytes, so
tests exercise the full data path end to end).

At 100 TB: payloads dominate row size, so these stages repartition by
payload-size buckets before the Python stage — batches stay
memory-bounded regardless of skew in asset sizes.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def synthesize_media_table(spark, num_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                seed = hashlib.sha256(f"media|{i}".encode()).digest()
                payload = (seed * ((i % 7) + 1))[: 64 + (i % 129)]
                rows.append(
                    (
                        i,
                        kind,
                        mimes[kind],
                        payload,
                        64 if kind == "image" else None,
                        64 if kind == "image" else None,
                        1000 + i % 5000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "mime",
                    "payload",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return spark.range(0, num_rows, numPartitions=parts).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes → unit-free floats."""
    h = hashlib.sha256(payload).digest()
    raw = (h * (dim * 4 // len(h) + 1))[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
    return arr / np.float32(2**32)


def _input_bytes_from_metadata(df: DataFrame) -> int | None:
    """Total input size from FILE METADATA only (no data scan): the scan
    relation's file listing. None for non-file-backed plans (synthesized
    tables, in-memory)."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = urllib.parse.urlparse(f)
        if p.scheme not in ("", "file"):
            # remote FS: listing sizes needs the Hadoop FS client; callers
            # on object stores pass total_bytes explicitly
            return None
        try:
            total += os.path.getsize(p.path or f)
        except OSError:
            return None
    return total


def size_bucketed(
    df: DataFrame,
    target_bucket_bytes: int = 64 << 20,
    total_bytes: int | None = None,
) -> DataFrame:
    """Repartition so each partition holds ~target bytes of payload —
    bounds Arrow batch memory under size skew.

    Partition count comes from *metadata*, never from a data pass: an
    explicit ``total_bytes`` (callers that know their input size — e.g.
    a manifest), else the scan's file-size metadata, else the session's
    default parallelism. (Round 1 ran a full ``sum(length(payload))``
    pre-scan here — at 100 TB that doubles IO and is a hard job
    barrier.)"""
    spark = df.sparkSession
    if total_bytes is None:
        total_bytes = _input_bytes_from_metadata(df)
    n = spark.sparkContext.defaultParallelism
    if total_bytes:
        n = max(n, int(total_bytes / target_bucket_bytes) + 1)
    return df.repartition(n, F.pmod(F.xxhash64("media_id"), F.lit(n * 4)))


def extract_features(
    df: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors.

    ``decoder='fake'`` uses the deterministic byte-derived decoder (tests,
    benches); ``decoder='real'`` raises NotImplementedError — wire an
    actual codec (PIL/librosa/pyav) when the runtime ships one."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "no media codecs in this runtime; use decoder='fake'"
                )
            feats = [
                _fake_decode(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).values,
                }
            )

    return size_bucketed(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp —
    the frame *decode* is stubbed (payload passthrough), the fan-out and
    schema are real."""
    frames = F.when(
        F.col("kind") == "video",
        F.sequence(
            F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
        ),
    ).otherwise(F.array(F.lit(0)))
    return df.select(
        "media_id",
        "kind",
        F.explode(frames).alias("frame_ms"),
        F.length("payload").alias("n_bytes"),
    )
