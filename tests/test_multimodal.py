"""Multimodal binary-column plumbing tests — schema, batch shapes
and stub behavior (decode itself is stubbed by design; see
multimodal/binary.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.multimodal import (
    attach_fake_payload,
    decode_image,
    extract_binary_meta,
    fake_feature_extract,
    frame_sample_plan,
    audio_segment_plan,
    decode_audio,
)


@pytest.fixture
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], ["doc_id", "text"]
    )
    return attach_fake_payload(docs, "doc_id", "text")


def test_payload_is_binary_with_meta(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<mime:string")


def test_extract_meta(media):
    out = {r.media_id: r for r in extract_binary_meta(media).collect()}
    assert out[1].n_bytes == len(b"hello world")
    assert out[1].sniffed_format == "unknown"  # text payload, no magic
    assert len(out[1].payload_sha256) == 64


def test_decode_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        decode_image(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or "stubbed" in str(exc_info.value)


def test_fake_feature_extract_batch_shape(media):
    out = fake_feature_extract(media, dim=16).collect()
    assert len(out) == 2
    for r in out:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), ("video/mp4", None, None, 3500)),
         (2, bytearray(b"y"), ("image/png", 10, 10, None))],
        "media_id long, payload binary, meta struct<mime string, width int, height int, duration_ms int>",
    )
    out = frame_sample_plan(df, every_ms=1000).collect()
    # 3500ms at 1fps -> frames at 0,1000,2000; image row produces none
    assert [(r.media_id, r.frame_idx, r.ts_ms) for r in out] == [
        (1, 0, 0), (1, 1, 1000), (1, 2, 2000)
    ]


def test_resize_dims_aspect_fit(spark):
    from etl_pipelines_spark.multimodal import with_resize_dims

    df = spark.createDataFrame(
        [
            (1, bytearray(b"a"), ("image/png", 1024, 512, None)),  # downscale, wide
            (2, bytearray(b"b"), ("image/png", 100, 100, None)),   # already fits
            (3, bytearray(b"c"), ("image/png", 300, 600, None)),   # downscale, tall
        ],
        "media_id long, payload binary, meta struct<mime string, width int, height int, duration_ms int>",
    )
    out = {r.media_id: r for r in with_resize_dims(df, 256, 256).collect()}
    assert (out[1].target_width, out[1].target_height) == (256, 128)
    assert (out[2].target_width, out[2].target_height) == (100, 100)  # no upscale
    assert (out[3].target_width, out[3].target_height) == (128, 256)


def test_resize_image_is_stubbed(spark, media):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from etl_pipelines_spark.multimodal import resize_image

    with _pytest.raises((Py4JJavaError, Exception)) as exc:
        resize_image(media).collect()
    assert "stubbed" in str(exc.value)


def test_audio_segment_plan(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"a"), ("audio/wav", None, None, 2400)),
         (2, bytearray(b"b"), ("audio/wav", None, None, 800)),
         (3, bytearray(b"c"), ("image/png", 10, 10, None))],
        "media_id long, payload binary, meta struct<mime string, width int, height int, duration_ms int>",
    )
    out = audio_segment_plan(df, window_ms=1000, hop_ms=500).collect()
    # 2400ms: floor((2400-1000)/500)+1 = 3 windows at 0/500/1000;
    # the 800ms clip is shorter than one window; the image has no duration
    assert [(r.media_id, r.seg_idx, r.start_ms, r.end_ms) for r in out] == [
        (1, 0, 0, 1000), (1, 1, 500, 1500), (1, 2, 1000, 2000)
    ]


def test_decode_audio_is_stubbed(spark, media):
    assert decode_audio(media).schema.simpleString() == (
        "struct<media_id:bigint,sample_rate:int,n_samples:bigint,channels:int>"
    )
    with pytest.raises(Exception, match="stubbed"):
        decode_audio(media).collect()
