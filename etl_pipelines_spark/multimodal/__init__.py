"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Uncompressed formats decode FOR REAL with numpy as the codec —
P6 PPM images (decode_ppm_image, resize_ppm_image with true
nearest-neighbor resampling), PCM WAV audio (decode_wav_audio), and
PNG (decode_png_image: stdlib zlib + numpy unfiltering incl. Paeth).
Entropy-codec formats (JPEG/MP3/MP4) stay honestly stubbed
(NotImplementedError, clearly marked); everything Spark-side —
schema conventions, Arrow batch shapes, mapInPandas plumbing,
partitioning — is real and tested either way.
"""

from .binary import (
    MEDIA_SCHEMA,
    attach_fake_payload,
    audio_segment_plan,
    decode_audio,
    decode_image,
    decode_gif_image,
    decode_png_image,
    decode_ppm_image,
    decode_wav_audio,
    extract_binary_meta,
    fake_feature_extract,
    frame_sample_plan,
    image_patch_plan,
    resize_image,
    resize_ppm_image,
    synth_gif_payloads,
    synth_png_payloads,
    synth_ppm_payload,
    synth_wav_payload,
    with_resize_dims,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_payload",
    "audio_segment_plan",
    "decode_audio",
    "decode_image",
    "decode_gif_image",
    "decode_png_image",
    "decode_ppm_image",
    "decode_wav_audio",
    "extract_binary_meta",
    "fake_feature_extract",
    "frame_sample_plan",
    "image_patch_plan",
    "resize_image",
    "resize_ppm_image",
    "synth_gif_payloads",
    "synth_png_payloads",
    "synth_ppm_payload",
    "synth_wav_payload",
    "with_resize_dims",
]
