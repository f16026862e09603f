"""Real GIF codec (multimodal/binary._gif_codec) — the fourth
no-imaging-library codec (PPM, WAV, PNG, GIF).

The encoder emits the classic "no-compression" LZW stream (literal
codes + periodic CLEAR); the DECODER implements full variable-width
LZW with table growth. To prove the decoder handles streams the
encoder never produces, this file carries an independent REFERENCE
LZW COMPRESSOR (textbook GIF-LZW with real table growth through
every code width) and asserts decode∘compress == identity.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_pipelines_spark.multimodal.binary import _gif_codec


def _reference_lzw_compress(indices, mcs):
    """Textbook GIF LZW: string table, growing code width, CLEAR at
    table-full (the compressing encoder our no-compression product
    encoder is NOT)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out_codes = []

    def reset():
        return {bytes([i]): i for i in range(clear)}, end + 1, mcs + 1

    table, next_code, width = reset()
    out_codes.append((clear, width))
    prefix = b""
    for v in indices:
        probe = prefix + bytes([int(v)])
        if probe in table:
            prefix = probe
            continue
        out_codes.append((table[prefix], width))
        table[probe] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            out_codes.append((clear, width))
            table, next_code, width = reset()
        prefix = bytes([int(v)])
    if prefix:
        out_codes.append((table[prefix], width))
    out_codes.append((end, width))
    acc = nbits = 0
    data = bytearray()
    for code, w in out_codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _wrap_gif(w, h, palette, mcs, lzw_data):
    depth = max(1, (len(palette) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    # a graphic-control extension the decoder must skip
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (3, 5), (17, 9), (64, 80)])
    def test_random_roundtrip(self, shape):
        encode, decode = _gif_codec()
        rng = np.random.RandomState(7)
        arr = (rng.randint(0, 4, (*shape, 3)) * 64).astype(np.uint8)
        assert (decode(encode(arr)) == arr).all()

    def test_mono_and_two_color(self):
        encode, decode = _gif_codec()
        a = np.zeros((5, 7, 3), np.uint8)
        assert (decode(encode(a)) == a).all()
        b = np.zeros((4, 6, 3), np.uint8)
        b[:, :3] = 255
        assert (decode(encode(b)) == b).all()

    def test_256_color_palette(self):
        encode, decode = _gif_codec()
        arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
        arr = np.stack([arr, arr[::-1], arr.T], axis=-1)
        assert (decode(encode(arr)) == arr).all()


class TestDecoderAgainstRealCompression:
    def test_table_growth_stream(self):
        """A highly repetitive 4096-pixel image compresses with deep
        LZW table growth (codes widen 3 -> 9+ bits); the product
        decoder must reproduce it exactly."""
        _, decode = _gif_codec()
        rng = np.random.RandomState(3)
        idx = np.tile(rng.randint(0, 4, 64), 64).astype(np.uint8)
        palette = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        data = _reference_lzw_compress(idx, mcs=2)
        gif = _wrap_gif(64, 64, palette, 2, data)
        img = decode(gif)
        assert (img == palette[idx].reshape(64, 64, 3)).all()

    def test_table_full_clear_cycle(self):
        """Enough distinct runs to drive next_code to 4096 and force
        the mid-stream CLEAR + table rebuild path."""
        _, decode = _gif_codec()
        rng = np.random.RandomState(11)
        idx = rng.randint(0, 256, 40_000).astype(np.uint8)
        palette = np.stack(
            [np.arange(256), np.arange(256)[::-1], np.arange(256)], -1
        ).astype(np.uint8)
        data = _reference_lzw_compress(idx, mcs=8)
        gif = _wrap_gif(200, 200, palette, 8, data)
        assert (decode(gif) == palette[idx].reshape(200, 200, 3)).all()

    def test_interlace_raises(self):
        _, decode = _gif_codec()
        palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        data = _reference_lzw_compress(np.zeros(4, np.uint8), mcs=2)
        gif = bytearray(_wrap_gif(2, 2, palette, 2, data))
        # set the interlace flag in the image descriptor packed byte
        pos = gif.index(b"\x2c")
        gif[pos + 9] |= 0x40
        with pytest.raises(NotImplementedError):
            decode(bytes(gif))


class TestSparkPlumbing:
    def test_synth_decode_closed_form(self, spark):
        from pyspark.sql import functions as F

        from etl_pipelines_spark.multimodal import (
            decode_gif_image,
            synth_gif_payloads,
        )

        base = spark.range(0, 40).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
        )
        out = decode_gif_image(synth_gif_payloads(base)).collect()
        assert len(out) == 40
        for r in out:
            mid, w, h = r.media_id, r.width, r.height
            c = [mid % 256, (mid * 5) % 256, (mid * 11) % 256]
            for ch, s in zip(c, [r.sum_r, r.sum_g, r.sum_b]):
                assert s == h * ((w // 2) * ch + (w - w // 2) * (255 - ch))

    def test_fused_equals_two_stage_and_single_python_node(self, spark):
        """r12 batch 6: synth→decode fused into ONE mapInPandas
        (binary.fuse_pandas_stages) must (a) return exactly the rows
        of the two-stage chain and (b) plan a SINGLE Python node —
        the payload bytes never re-cross the JVM↔Python boundary."""
        from pyspark.sql import functions as F

        from etl_pipelines_spark.multimodal import (
            decode_gif_image,
            synth_decode_gif,
            synth_gif_payloads,
        )

        base = spark.range(0, 40).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
        )
        two = decode_gif_image(synth_gif_payloads(base))
        fused = synth_decode_gif(base)
        key = sorted(two.columns)
        rows_two = sorted(map(repr, two.select(*key).collect()))
        rows_fused = sorted(map(repr, fused.select(*key).collect()))
        assert rows_two == rows_fused
        plan = fused._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        two_plan = two._jdf.queryExecution().executedPlan().toString()
        assert two_plan.count("MapInPandas") == 2  # negative control
