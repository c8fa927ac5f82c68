"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode
kernels are deterministic stand-ins clearly marked as such — but the
Spark-side contract (schema, Arrow batch shape, ``mapInPandas``
partition-parallel execution) is real and tested. Swapping the stub body
for a PIL/torchaudio call changes nothing about the plan.

Layout rule at scale: binary payloads live in their own column so parquet
column pruning means metadata-only queries never read the blobs; the table
is partitioned/bucketed by content id.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic stand-in for an image decode.

    A real deployment replaces this body with e.g. PIL.Image.open; the
    fake derives stable pseudo-dimensions from the content hash so tests
    are exact.
    """
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract media payloads, partition-parallel via Arrow.

    One Arrow batch in → one feature frame out; no per-row Python UDF
    calls, no shuffle (narrow transformation over the scan).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table (payload = md5-chain bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
