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


class TestRealDecode:
    """The numpy-as-codec paths: P6 PPM and PCM WAV decode for real."""

    def _gradient_ppm(self, w, h):
        """Hand-built P6 with a full gradient — every pixel distinct."""
        import numpy as np

        img = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                img[y, x] = ((x * 7 + y) % 256, (x + y * 5) % 256, (x * y) % 256)
        return f"P6\n{w} {h}\n255\n".encode() + img.tobytes(), img

    def test_ppm_decode_exact_pixels(self, spark):
        import numpy as np

        buf, img = self._gradient_ppm(13, 9)
        df = spark.createDataFrame([(1, bytearray(buf))], "media_id long, payload binary")
        from etl_pipelines_spark.multimodal import decode_ppm_image

        row = decode_ppm_image(df).first()
        assert (row.width, row.height, row.channels) == (13, 9, 3)
        flat = img.reshape(-1, 3).mean(axis=0)
        assert row.mean_r == pytest.approx(flat[0], abs=0)
        assert row.mean_g == pytest.approx(flat[1], abs=0)
        assert row.mean_b == pytest.approx(flat[2], abs=0)

    def test_ppm_decode_handles_comments(self, spark):
        buf, _ = self._gradient_ppm(4, 3)
        commented = buf.replace(b"P6\n", b"P6\n# a comment line\n", 1)
        df = spark.createDataFrame(
            [(1, bytearray(commented))], "media_id long, payload binary"
        )
        from etl_pipelines_spark.multimodal import decode_ppm_image

        row = decode_ppm_image(df).first()
        assert (row.width, row.height) == (4, 3)

    def test_resize_matches_numpy_reference(self, spark):
        import numpy as np

        buf, img = self._gradient_ppm(20, 16)
        meta = {"mime": "image/ppm", "width": 20, "height": 16, "duration_ms": None}
        df = spark.createDataFrame(
            [(1, bytearray(buf), meta)],
            "media_id long, payload binary, "
            "meta struct<mime string, width int, height int, duration_ms int>",
        )
        from etl_pipelines_spark.multimodal import resize_ppm_image

        row = resize_ppm_image(df, max_w=10, max_h=10).first()
        # aspect fit: 20x16 -> 10x8
        assert (row.width, row.height) == (10, 8)
        got = bytes(row.payload)
        assert got.startswith(b"P6\n10 8\n255\n")
        pix = np.frombuffer(got, dtype=np.uint8, offset=len(b"P6\n10 8\n255\n"))
        pix = pix.reshape(8, 10, 3)
        yi = np.minimum(((np.arange(8) + 0.5) * 16 / 8).astype(int), 15)
        xi = np.minimum(((np.arange(10) + 0.5) * 20 / 10).astype(int), 19)
        want = img[yi][:, xi]
        assert np.array_equal(pix, want)

    def test_wav_decode_walks_chunks(self, spark):
        import struct

        # 16-bit stereo, 4410 samples, with an odd-length LIST chunk
        # before data to exercise word-aligned chunk walking
        sr, n, ch, bits = 44100, 4410, 2, 16
        data = b"\x01\x02" * (n * ch)
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                    sr * ch * bits // 8, ch * bits // 8, bits)
        lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
        dat = b"data" + struct.pack("<I", len(data)) + data
        body = b"WAVE" + fmt + lst + dat
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        df = spark.createDataFrame([(7, bytearray(buf))], "media_id long, payload binary")
        from etl_pipelines_spark.multimodal import decode_wav_audio

        row = decode_wav_audio(df).first()
        assert (row.sample_rate, row.n_samples, row.channels) == (sr, n, ch)
        assert row.duration_ms == pytest.approx(100.0)

    def test_synth_payloads_roundtrip(self, spark):
        """The Spark-expression synthesizers emit payloads the real
        decoders parse back to the constructed parameters."""
        from etl_pipelines_spark.multimodal import (
            decode_ppm_image,
            decode_wav_audio,
            synth_ppm_payload,
            synth_wav_payload,
        )

        base = spark.range(1, 6).select(F.col("id").alias("media_id"))
        ppm = base.select(
            "media_id",
            synth_ppm_payload(F.col("media_id"), F.lit(6), F.lit(5)).alias("payload"),
        )
        for r in decode_ppm_image(ppm).collect():
            assert (r.width, r.height) == (6, 5)
            assert r.mean_r == float(r.media_id % 256)
        wav = base.select(
            "media_id",
            synth_wav_payload(F.col("media_id"), F.lit(250), 8000).alias("payload"),
        )
        for r in decode_wav_audio(wav).collect():
            assert (r.sample_rate, r.n_samples, r.channels) == (8000, 250, 1)


class TestPngCodec:
    """Real PNG decode (stdlib zlib + numpy): exact round-trips per
    color type and per forced filter, plus the Spark-side encode ->
    decode path used by the mm_png_decode registry query."""

    def _codec(self):
        from etl_pipelines_spark.multimodal.binary import _png_codec

        return _png_codec()

    def test_random_roundtrip_rgb(self):
        import numpy as np

        enc, dec = self._codec()
        rng = np.random.RandomState(11)
        for shape in [(1, 1, 3), (4, 5, 3), (17, 23, 3), (12, 1, 3)]:
            arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
            out = dec(enc(arr))
            assert out.shape == shape
            assert (out == arr).all()

    def test_random_roundtrip_gray_and_rgba(self):
        import numpy as np

        enc, dec = self._codec()
        rng = np.random.RandomState(12)
        gray = rng.randint(0, 256, size=(9, 6, 1), dtype=np.uint8)
        assert (dec(enc(gray)) == gray).all()
        rgba = rng.randint(0, 256, size=(7, 8, 4), dtype=np.uint8)
        assert (dec(enc(rgba)) == rgba).all()

    def test_every_filter_type_roundtrips(self):
        """Each predictor (None/Sub/Up/Average/Paeth) forced on every
        scanline of a gradient — a wrong reconstruction in any branch
        fails exactly that filter's case."""
        import numpy as np

        enc, dec = self._codec()
        g = (np.arange(20 * 13 * 3).reshape(20, 13, 3) % 256).astype(np.uint8)
        for ft in range(5):
            assert (dec(enc(g, filters=[ft] * 20)) == g).all(), ft

    def test_decoder_rejects_non_png_and_unsupported(self):
        import pytest as _pytest

        enc, dec = self._codec()
        with _pytest.raises(ValueError):
            dec(b"P6\n1 1\n255\nabc")
        # 16-bit depth is out of scope: flip the IHDR depth byte
        # (sig 8 + len 4 + tag 4 + w 4 + h 4 = offset 24; the decoder
        # does not validate CRCs, it validates shapes)
        import numpy as np

        buf = bytearray(enc(np.zeros((2, 2, 3), np.uint8)))
        buf[24] = 16
        with _pytest.raises(ValueError):
            dec(bytes(buf))

    def test_spark_encode_decode_path(self, spark):
        """The registry query's plumbing: synth_png_payloads emits
        payloads that sniff as PNG, and decode_png_image recovers the
        closed-form dims + means."""
        from etl_pipelines_spark.multimodal import (
            decode_png_image,
            extract_binary_meta,
            synth_png_payloads,
        )
        from pyspark.sql import functions as F

        base = spark.range(1, 21).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
        )
        media = synth_png_payloads(base)
        sniff = extract_binary_meta(
            media.withColumn("meta", F.lit(None).cast("string"))
        ).select("sniffed_format").distinct().collect()
        assert [r[0] for r in sniff] == ["png"]
        rows = decode_png_image(media).orderBy("media_id").collect()
        for r in rows:
            assert r.width == r.media_id % 16 + 4
            assert r.height == r.media_id % 12 + 4
            assert r.channels == 3
            assert r.mean_r == float(r.media_id % 256)
            assert r.mean_g == float(r.media_id * 3 % 256)
            assert r.mean_b == float(r.media_id * 7 % 256)
