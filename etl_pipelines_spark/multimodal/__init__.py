"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (BASELINE.json north star).

Five formats decode FOR REAL with numpy as the codec — P6 PPM images
(decode_ppm_image, resize_ppm_image with true nearest-neighbor
resampling), PCM WAV audio (decode_wav_audio), PNG
(decode_png_image: stdlib zlib + numpy unfiltering incl. Paeth), GIF
(decode_gif_image: full variable-width LZW), and baseline JPEG
(decode_jpeg_image: canonical Huffman + dequant + exact IDCT +
chroma upsampling — jpeg.py). MP4 CONTAINERS parse for real too
(video.py: ISO-BMFF box-tree walk — duration, tracks, codec fourcc,
dimensions; frame decode is the H.264 line we honestly stub), and
so do MP3 CONTAINERS (mp3.py: frame-header walk — duration, bitrate,
sample rate, channels, ID3 skip; PCM decode is the Huffman+filterbank
line, stubbed). Only the transform-codec decodes (MP3 PCM, video
frames) remain stubbed (NotImplementedError, clearly marked);
everything Spark-side — schema
conventions, Arrow batch shapes, mapInPandas plumbing,
partitioning — is real and tested either way.
"""

from .audio import audio_band_energy
from .jpeg import decode_jpeg_image, synth_decode_jpeg, synth_jpeg_payloads
from .video import (
    extract_mp4_frames,
    extract_mp4_meta,
    synth_extract_mp4_frames,
    synth_extract_mp4_meta,
    parse_mp4_frames,
    parse_mp4_meta,
    synth_mp4_framed_payloads,
    synth_mp4_payloads,
)
from .mp3 import (
    extract_mp3_meta,
    parse_mp3_meta,
    synth_extract_mp3_meta,
    synth_mp3_payloads,
)
from .avi import (
    decode_avi_frames,
    synth_decode_avi_frames,
    parse_avi_mjpeg,
    synth_avi_mjpeg_payload,
    synth_avi_payloads,
)
from .binary import (
    MEDIA_SCHEMA,
    attach_fake_payload,
    audio_segment_plan,
    decode_audio,
    decode_image,
    decode_gif_image,
    decode_png_image,
    decode_ppm_image,
    synth_decode_gif,
    synth_decode_png,
    fuse_pandas_stages,
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
    "audio_band_energy",
    "audio_segment_plan",
    "decode_audio",
    "decode_image",
    "decode_gif_image",
    "decode_jpeg_image",
    "extract_mp3_meta",
    "parse_mp3_meta",
    "synth_mp3_payloads",
    "extract_mp4_frames",
    "extract_mp4_meta",
    "parse_mp4_frames",
    "parse_mp4_meta",
    "synth_mp4_framed_payloads",
    "synth_mp4_payloads",
    "synth_extract_mp4_frames",
    "synth_extract_mp4_meta",
    "synth_extract_mp3_meta",
    "synth_decode_jpeg",
    "synth_decode_gif",
    "synth_decode_png",
    "synth_decode_avi_frames",
    "fuse_pandas_stages",
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
    "synth_jpeg_payloads",
    "synth_png_payloads",
    "synth_ppm_payload",
    "synth_wav_payload",
    "with_resize_dims",
]
