"""Real baseline JPEG codec (multimodal/jpeg.py).

Contract: solid images with flat-8 quantization round-trip EXACTLY
(the closed-form leg the registered query stands on); arbitrary
images round-trip within baseline-quantization tolerance; restart
markers are pixel-invisible; color 4:4:4 decodes; progressive and
arithmetic streams are rejected loudly, not decoded wrongly.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec


class TestExactLeg:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 254, 255])
    def test_solid_gray_exact(self, v):
        encode, decode = _jpeg_codec()
        for shape in [(8, 8), (5, 7), (20, 13), (64, 64)]:
            a = np.full(shape, v, np.uint8)
            out = decode(encode(a))
            assert out.shape == (*shape, 1)
            assert (out[:, :, 0] == a).all()

    def test_blockwise_flat_exact(self):
        """Per-8x8-flat (but globally varying) images are also exact:
        every block is DC-only."""
        encode, decode = _jpeg_codec()
        rng = np.random.RandomState(2)
        tiles = rng.randint(0, 256, (4, 5)).astype(np.uint8)
        a = np.kron(tiles, np.ones((8, 8), np.uint8))
        assert (decode(encode(a))[:, :, 0] == a).all()


class TestLossyLeg:
    def test_random_gray_within_quant_tolerance(self):
        encode, decode = _jpeg_codec()
        rng = np.random.RandomState(5)
        a = rng.randint(0, 256, (24, 31)).astype(np.uint8)
        out = decode(encode(a))[:, :, 0].astype(int)
        err = np.abs(out - a.astype(int))
        # flat-8 quantization: max per-coefficient error q/2 -> worst
        # pixel error bounded well under 16 in practice
        assert err.max() <= 16 and err.mean() < 4

    def test_smooth_gradient_tight(self):
        encode, decode = _jpeg_codec()
        g = np.linspace(0, 255, 32 * 40).reshape(32, 40).astype(np.uint8)
        out = decode(encode(g))[:, :, 0].astype(int)
        assert np.abs(out - g.astype(int)).max() <= 3

    def test_color_solid_near_exact(self):
        encode, decode = _jpeg_codec()
        c = np.zeros((16, 16, 3), np.uint8)
        c[:] = [200, 30, 90]
        out = decode(encode(c)).astype(int)
        assert np.abs(out - c.astype(int)).max() <= 2


class TestBitstream:
    def test_restart_markers_pixel_invisible(self):
        encode, decode = _jpeg_codec()
        rng = np.random.RandomState(7)
        g = rng.randint(0, 256, (40, 33)).astype(np.uint8)
        assert (decode(encode(g)) == decode(encode(g, restart_interval=3))).all()
        c = rng.randint(0, 256, (17, 25, 3)).astype(np.uint8)
        assert (decode(encode(c)) == decode(encode(c, restart_interval=2))).all()

    def test_ff_stuffing_roundtrip(self):
        """Values engineered to produce 0xFF bytes in the entropy
        stream must survive de-stuffing."""
        encode, decode = _jpeg_codec()
        rng = np.random.RandomState(13)
        for _ in range(5):
            a = rng.randint(0, 256, (16, 16)).astype(np.uint8)
            buf = encode(a)
            assert decode(buf).shape == (16, 16, 1)

    def test_progressive_rejected(self):
        encode, decode = _jpeg_codec()
        buf = bytearray(encode(np.zeros((8, 8), np.uint8)))
        i = buf.index(b"\xff\xc0")
        buf[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError):
            decode(bytes(buf))

    def test_not_a_jpeg(self):
        _, decode = _jpeg_codec()
        with pytest.raises(ValueError):
            decode(b"\x89PNG\r\n\x1a\n")


class TestSparkPlumbing:
    def test_synth_decode_closed_form(self, spark):
        from pyspark.sql import functions as F

        from etl_pipelines_spark.multimodal import (
            decode_jpeg_image,
            synth_jpeg_payloads,
        )

        base = spark.range(0, 40).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
        )
        out = decode_jpeg_image(synth_jpeg_payloads(base)).collect()
        assert len(out) == 40
        for r in out:
            want = r.width * r.height * (r.media_id % 256)
            assert r.channels == 1
            assert (r.sum_r, r.sum_g, r.sum_b) == (want, want, want)


class TestChromaSubsampling:
    """4:2:0 — the decoder's chroma-upsample path driven by a real
    subsampled stream from the encoder's chroma_subsample option."""

    def test_420_solid_near_exact(self):
        encode, decode = _jpeg_codec()
        s = np.zeros((24, 40, 3), np.uint8)
        s[:] = [180, 40, 220]
        out = decode(encode(s, chroma_subsample=True)).astype(int)
        assert out.shape == s.shape
        assert np.abs(out - s.astype(int)).max() <= 2

    def test_420_tracks_444_on_smooth_image(self):
        encode, decode = _jpeg_codec()
        sm = np.zeros((32, 48, 3), np.uint8)
        yy, xx = np.mgrid[0:32, 0:48]
        sm[..., 0] = (yy * 4) % 256
        sm[..., 1] = (xx * 3) % 256
        sm[..., 2] = 128
        o444 = decode(encode(sm)).astype(int)
        o420 = decode(
            encode(sm, chroma_subsample=True, restart_interval=4)
        ).astype(int)
        assert np.abs(o444 - o420).mean() < 4

    def test_420_odd_dimensions(self):
        encode, decode = _jpeg_codec()
        rng = np.random.RandomState(9)
        odd = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
        out = decode(encode(odd, chroma_subsample=True))
        assert out.shape == odd.shape
