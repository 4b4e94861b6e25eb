"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata structs and
runs decode / feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` stages.  Decode kernels are REAL for PNG (pure
zlib/struct decoder+encoder) and WAV (stdlib ``wave``); other blobs get
content byte-statistics features (SQL-re-derivable).  Only true video
container decode remains out of scope (no stdlib codec) — documented in
ops.sample_frames.
"""

from arcadedb_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_features,
    extract_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_features",
    "extract_features",
    "resize_images",
    "sample_frames",
]
