"""Multimodal columns: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the *decode* step is a
deterministic fake behind a clearly-marked boundary — but every piece of
Spark plumbing around it is real and tested: schemas, Arrow batch
shapes, mapInPandas iterator contracts, partition sizing.

At 100 TB the rules encoded here are: binary payloads ride in their own
column (Parquet keeps them out of unrelated scans via column pruning);
feature extraction is mapInPandas (streaming Arrow batches, bounded
memory); and metadata predicates (width/height/duration filters) push
down to the scan because they live in ordinary typed columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),          # image | audio | video
        StructField("payload", BinaryType(), True),        # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real decoders (PIL/ffmpeg) are not in this container.

    Deterministic fake: derives an 8x8 grayscale patch from the payload
    hash so downstream plumbing (shapes, dtypes, batching) is exercised
    honestly.  Replace the body with a real decoder in production.
    """
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype(np.float64)
    return arr.reshape(8, 8) / 255.0


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
        StructField("feat_vec", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches contract: bounded memory however large the
    partition; Arrow moves the binary column zero-copy.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_mean": [float(f.mean()) for f in feats],
                    "feat_std": [float(f.std()) for f in feats],
                    "feat_vec": [f.ravel().tolist() for f in feats],
                }
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.

    The decode itself is the stub; the *plan* (explode of a sequence
    bounded by duration metadata, pushdown-friendly) is the real part.
    """
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, greatest(duration_ms - 1, 0), {every_ms})")
        ).alias("frame_ts_ms"),
    )
