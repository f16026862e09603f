"""MP4 container parsing (multimodal/video.py) and audio spectral
features (multimodal/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_pipelines_spark.multimodal.video import (
    parse_mp4_meta,
    synth_mp4_payload,
)


class TestMp4Parser:
    def test_roundtrip_fields(self):
        m = parse_mp4_meta(synth_mp4_payload(42, 95, 640, 360))
        assert m["brand"] == "isom"
        assert m["duration_ms"] == 95000
        t = m["tracks"][0]
        assert (t["track_id"], t["width"], t["height"]) == (43, 640, 360)
        assert t["handler"] == "vide" and t["codec"] == "avc1"

    def test_largesize_box(self):
        """64-bit largesize header must parse identically."""
        buf = bytearray(synth_mp4_payload(7, 10, 320, 240))
        # rewrite the ftyp box as size=1 + 64-bit largesize
        size = struct.unpack(">I", buf[0:4])[0]
        big = struct.pack(">I4sQ", 1, b"ftyp", size + 8) + bytes(
            buf[8:size]
        )
        rest = bytes(buf[size:])
        m = parse_mp4_meta(big + rest)
        assert m["brand"] == "isom" and m["duration_ms"] == 10000

    def test_not_bmff_raises(self):
        with pytest.raises(ValueError):
            parse_mp4_meta(b"\x00\x00\x00\x08freeXXXX")
        with pytest.raises(ValueError):
            parse_mp4_meta(b"GIF89a" + b"\x00" * 20)

    def test_corrupt_size_raises(self):
        buf = bytearray(synth_mp4_payload(1, 5, 64, 64))
        buf[0:4] = struct.pack(">I", len(buf) + 999)
        with pytest.raises(ValueError):
            parse_mp4_meta(bytes(buf))


class TestAudioBandEnergy:
    def _wav(self, samples, rate=8000):
        x = np.asarray(samples)
        data = (np.clip(np.round(x), -32768, 32767).astype("<i2")).tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        out = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(data)) + data
        return out

    def test_pure_tone_lands_in_right_band(self, spark):
        from etl_pipelines_spark.multimodal import audio_band_energy

        rate, n = 8000, 4096
        t = np.arange(n) / rate
        rows = []
        for mid, freq in [(0, 250.0), (1, 1250.0), (2, 3600.0)]:
            rows.append((mid, self._wav(10000 * np.sin(2 * np.pi * freq * t))))
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r.media_id: r for r in audio_band_energy(df, n_bands=8).collect()}
        # nyquist 4000 Hz over 8 bands -> 500 Hz per band; tones sit
        # mid-band (band edges are bin-quantized, boundary tones can
        # land either side)
        for mid, want_band in [(0, 0), (1, 2), (2, 7)]:
            be = out[mid].band_energy
            assert int(np.argmax(be)) == want_band, (mid, be)
            assert be[want_band] > 0.95
            assert abs(sum(be) - 1.0) < 1e-9

    def test_parseval_rms(self, spark):
        from etl_pipelines_spark.multimodal import audio_band_energy

        rng = np.random.RandomState(3)
        x = rng.randint(-2000, 2000, 2048).astype(float)
        df = spark.createDataFrame(
            [(9, self._wav(x))], "media_id long, payload binary"
        )
        r = audio_band_energy(df).collect()[0]
        assert r.n_samples == 2048
        assert abs(r.rms - float(np.sqrt(np.mean(x * x)))) < 1.0
