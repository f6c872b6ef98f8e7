"""Multimodal column plumbing (north-star ops, BASELINE.json).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side machinery here — schemas, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample stages, partition
sizing — is real and tested; the actual codec calls are STUBBED
(``decode_real`` raises NotImplementedError; the deterministic fake
derives metadata from the bytes) because image/audio libraries are
not available in this environment.

At 100 TB: payloads stay in parquet binary columns (never collected),
each mapInPandas stage streams Arrow batches, and
``spark.sql.files.maxPartitionBytes`` bounds per-task memory. Decoded
features (small, fixed-width) flow on; raw bytes are dropped as early
as the plan allows.
"""

from __future__ import annotations

import sys
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

# Workers don't share the driver's sys.path (see functions/udfs.py):
# pickle this module's functions by value so mapInPandas stages run
# no matter how the host imported the repo.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

#: Schema of a multimodal asset row (payload + typed metadata).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("sha_hex", StringType()),
    ]
)

#: Schema produced by the (stubbed) image decode stage.
DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature_hash", StringType()),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic multimodal asset table from the
    documents fixture: text bytes stand in for media payloads."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr("element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1)").alias(
            "modality"
        ),
        F.col("text").cast("binary").alias("payload"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.sha2("text", 256).alias("sha_hex"),
    )


def decode_real(payload: bytes, modality: str):  # pragma: no cover
    """Real codec hook (PIL/librosa/pyav at deploy time)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "wire PIL/librosa/pyav here at deploy time"
    )


def _decode_fake(payload: bytes, modality: str) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived from the bytes so
    the distributed plumbing is fully testable."""
    n = len(payload)
    width = 16 + (n % 240)
    height = 16 + ((n // 7) % 240)
    n_frames = 1 if modality == "image" else 1 + (n % 30)
    return width, height, n_frames


def decode_assets(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over asset batches →
    DECODED_SCHEMA. Raw payload is dropped on output (narrow rows
    flow downstream)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            fn = decode_real if use_real_codec else _decode_fake
            meta = [fn(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "feature_hash": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(_decode, DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning stage (pure column math — the actual pixel
    resample is part of decode_real at deploy time): computes the
    target geometry preserving aspect ratio."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "asset_id",
        "modality",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample(decoded: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video assets: one row per kept frame
    index (sequence + explode; JVM-side)."""
    return (
        decoded.where(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.expr(
                    f"sequence(cast(0 as bigint), cast(n_frames - 1 as bigint),"
                    f" cast({every_n} as bigint))"
                )
            ).alias("frame_idx"),
        )
    )
