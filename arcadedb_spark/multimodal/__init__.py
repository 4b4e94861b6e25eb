"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs and
runs decode / feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` stages.  The decode kernels are STUBBED (no image/audio
libs in this container — clearly marked below); the Spark-side plumbing —
schemas, batch iteration, partitioning — is real and tested, so swapping a
real decoder in is a one-function change.
"""

from arcadedb_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_features,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA", "attach_media_metadata", "extract_features", "sample_frames",
]
