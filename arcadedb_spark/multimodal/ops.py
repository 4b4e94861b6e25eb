"""Multimodal column operators — real Spark plumbing, stubbed decode.

Shape contract for media columns:
    media: binary                      -- opaque encoded bytes
    media_meta: struct<mime:string, width:int, height:int,
                       duration_ms:long, sample_rate:int>

Decode / feature extraction run as ``mapInPandas`` (Arrow batches — the
only sane way to move binary blobs through Python), partition-preserving,
one Python worker per core.  The decode kernel itself is a STUB: this
container has no image/audio libs, so `_decode_stub` produces a
deterministic fake (seeded by content hash).  Replace `_decode_stub` with
a PIL/libav call to go real — nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, mime: str) -> DataFrame:
    """Synthesize a typed metadata struct for an opaque binary column."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _decode_stub(data: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from a content hash.

    Real implementation would be e.g. PIL.Image.open + model forward;
    raise NotImplementedError here if silent fakes are unacceptable.
    """
    if data is None:
        return np.zeros(dim, dtype=np.float32)
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    df: DataFrame, binary_col: str, id_col: str, dim: int = 16
) -> DataFrame:
    """binary column → feature vector via Arrow-batched mapInPandas.

    Output: (id, features: array<float>).  Batch shape: the iterator
    yields one pandas frame per Arrow batch — memory stays bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
    sizes.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(b, dim).tolist() for b in pdf[binary_col]
            ]
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(F.col(id_col).cast("long").alias(id_col), binary_col).mapInPandas(
        batches, schema
    )


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str, n_frames: int = 4
) -> DataFrame:
    """Video frame sampling (STUB decode): one row per sampled frame with
    a deterministic frame fingerprint — exercises the explode-after-
    mapInPandas shape a real frame sampler uses."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, hashes = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                h = (
                    int.from_bytes(hashlib.sha256(blob or b"").digest()[:8], "big")
                    if blob is not None
                    else 0
                )
                for f_ in range(n_frames):
                    ids.append(rid)
                    frames.append(f_)
                    hashes.append((h + f_) % (2**62))
            yield pd.DataFrame({"id": ids, "frame_no": frames, "frame_hash": hashes})

    return df.select(F.col(id_col).cast("long").alias(id_col), binary_col).mapInPandas(
        batches, schema
    )


def resize_images(
    df: DataFrame, binary_col: str, id_col: str, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize plumbing (STUB decode): emits the resized-blob column
    shape a real decoder would produce — (id, resized: binary, width,
    height).  The stub round-trips the content hash so downstream exact-
    dedup over resized blobs is deterministic; swap ``_resize_stub`` for
    a PIL/OpenCV call on clusters that have the codecs."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize_stub(blob: bytes) -> bytes:
        # deterministic fake: hash-derived bytes of the target size class
        h = hashlib.sha256(blob or b"").digest()
        return h * ((width * height * 3 // len(h)) % 64 + 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "resized": [_resize_stub(b) for b in pdf[binary_col]],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), binary_col).mapInPandas(
        batches, schema
    )
