"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

The container has no image/audio codecs, so the *decode* steps are
stubbed (NotImplementedError or a deterministic fake, clearly
marked); everything Spark-side — schema conventions, Arrow batch
shapes, mapInPandas plumbing, partitioning — is real and tested.
"""

from .binary import (
    MEDIA_SCHEMA,
    attach_fake_payload,
    extract_binary_meta,
    decode_image,
    fake_feature_extract,
    frame_sample_plan,
    audio_segment_plan,
    decode_audio,
    with_resize_dims,
    resize_image,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_payload",
    "extract_binary_meta",
    "decode_image",
    "fake_feature_extract",
    "frame_sample_plan",
    "audio_segment_plan",
    "decode_audio",
    "with_resize_dims",
    "resize_image",
]
