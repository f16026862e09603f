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


class TestMp4Frames:
    """Per-frame sample-table walk (parse_mp4_frames, VERDICT r5 #8)."""

    def test_synth_roundtrip(self):
        from etl_pipelines_spark.multimodal.video import parse_mp4_frames

        sizes = [100, 110, 120, 130]
        buf = synth_mp4_payload(9, 1, 64, 64, frames=(4, 40, sizes))
        fr = parse_mp4_frames(buf)
        assert [f["frame_idx"] for f in fr] == [0, 1, 2, 3]
        assert [f["ts_ms"] for f in fr] == [0, 40, 80, 120]
        assert all(f["duration_ms"] == 40 for f in fr)
        assert [f["byte_size"] for f in fr] == sizes
        assert [f["byte_offset"] for f in fr] == [4096, 4196, 4306, 4426]

    def test_legacy_payload_without_tables_raises(self):
        from etl_pipelines_spark.multimodal.video import parse_mp4_frames

        with pytest.raises(ValueError, match="sample tables"):
            parse_mp4_frames(synth_mp4_payload(1, 5, 64, 64))

    def test_multi_chunk_and_multi_run_stts(self):
        """Hand-built stbl: 2 stts runs + 2 chunks via stsc/stco —
        the general §8.7.4 walk, not just the one-chunk synth."""
        from etl_pipelines_spark.multimodal.video import (
            _box,
            _fullbox,
            parse_mp4_frames,
        )

        sizes = [10, 20, 30, 40, 50]
        stts = _fullbox() + struct.pack(">I", 2) + struct.pack(
            ">II", 2, 100
        ) + struct.pack(">II", 3, 200)
        stsz = _fullbox() + struct.pack(">II", 0, 5) + struct.pack(
            ">5I", *sizes
        )
        # chunk 1: 2 samples, chunk 2: 3 samples
        stsc = _fullbox() + struct.pack(">I", 2) + struct.pack(
            ">III", 1, 2, 1
        ) + struct.pack(">III", 2, 3, 1)
        stco = _fullbox() + struct.pack(">III", 2, 1000, 5000)
        stsd = _fullbox() + struct.pack(">I", 1) + _box(b"avc1", b"\x00" * 78)
        mdhd = _fullbox() + struct.pack(">IIII", 0, 0, 1000, 500) + b"\x00" * 4
        stbl = _box(
            b"stbl",
            _box(b"stsd", stsd) + _box(b"stts", stts)
            + _box(b"stsz", stsz) + _box(b"stsc", stsc)
            + _box(b"stco", stco),
        )
        trak = _box(
            b"trak",
            _box(b"mdia", _box(b"mdhd", mdhd) + _box(b"minf", stbl)),
        )
        buf = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"moov", trak)
        fr = parse_mp4_frames(buf)
        assert [f["ts_ms"] for f in fr] == [0, 100, 200, 400, 600]
        assert [f["duration_ms"] for f in fr] == [100, 100, 200, 200, 200]
        assert [f["byte_offset"] for f in fr] == [
            1000, 1010, 5000, 5030, 5070
        ]
        assert [f["byte_size"] for f in fr] == sizes

    def test_inconsistent_tables_raise(self):
        from etl_pipelines_spark.multimodal.video import parse_mp4_frames

        # stts claims 5 samples, stsz has 4
        buf = bytearray(synth_mp4_payload(9, 1, 64, 64,
                                          frames=(4, 40, [100] * 4)))
        i = bytes(buf).find(b"stts")
        # entry count at i+8 (after fullbox), sample_count at i+12
        buf[i + 12 : i + 16] = struct.pack(">I", 5)
        with pytest.raises(ValueError):
            parse_mp4_frames(bytes(buf))


class TestMp3Parser:
    def test_roundtrip_fields(self):
        from etl_pipelines_spark.multimodal.mp3 import (
            BITRATE_KBPS_V1,
            SAMPLE_RATES,
            parse_mp3_meta,
            synth_mp3_payload,
        )

        for mid in (0, 1, 13, 14, 27, 997):
            m = parse_mp3_meta(synth_mp3_payload(mid, n_frames=12))
            assert m["version"] == "MPEG1"
            assert m["n_frames"] == 12
            assert m["bitrate_kbps"] == BITRATE_KBPS_V1[mid % 14 + 1]
            sr = SAMPLE_RATES[1][mid % 3]
            assert m["sample_rate"] == sr
            assert m["channels"] == (1 if mid % 2 == 0 else 2)
            assert m["has_id3"] == (mid % 2 == 0)
            assert m["duration_ms"] == 12 * 1152 * 1000 // sr

    def test_every_bitrate_samplerate_combination(self):
        """Property over the full table cross-product: frame length
        144000·kbps/sr (+pad) must walk back to the exact frame
        count for every legal (bitrate, sample-rate) pair — the
        table-driven failure mode (wrong row → lost sync)."""
        from etl_pipelines_spark.multimodal.mp3 import (
            BITRATE_KBPS_V1,
            SAMPLE_RATES,
            parse_mp3_meta,
        )

        for br_idx in range(1, 15):
            for sr_idx in range(3):
                kbps = BITRATE_KBPS_V1[br_idx]
                sr = SAMPLE_RATES[1][sr_idx]
                flen = 144000 * kbps // sr
                hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0])
                buf = (hdr + b"\x00" * (flen - 4)) * 7
                m = parse_mp3_meta(buf)
                assert m["n_frames"] == 7, (br_idx, sr_idx)
                assert m["bitrate_kbps"] == kbps
                assert m["sample_rate"] == sr

    def test_padding_bit_lengthens_frame(self):
        """Padding adds exactly one byte per padded frame; the walk
        must consume it or every later frame loses sync."""
        from etl_pipelines_spark.multimodal.mp3 import parse_mp3_meta

        flen = 144000 * 128 // 44100  # br_idx 9, sr_idx 0
        plain = bytes([0xFF, 0xFB, (9 << 4), 0]) + b"\x00" * (flen - 4)
        padded = bytes([0xFF, 0xFB, (9 << 4) | 2, 0]) + b"\x00" * (flen - 3)
        m = parse_mp3_meta(padded + plain + padded)
        assert m["n_frames"] == 3

    def test_vbr_stream_counts_every_frame_bitrate(self):
        """Bitrate may change per frame (VBR); the walk must use each
        frame's OWN table row."""
        from etl_pipelines_spark.multimodal.mp3 import (
            BITRATE_KBPS_V1,
            parse_mp3_meta,
        )

        frames = []
        for br_idx in (1, 9, 14, 5):
            flen = 144000 * BITRATE_KBPS_V1[br_idx] // 44100
            frames.append(
                bytes([0xFF, 0xFB, (br_idx << 4), 0]) + b"\x00" * (flen - 4)
            )
        m = parse_mp3_meta(b"".join(frames))
        assert m["n_frames"] == 4
        assert m["bitrate_kbps"] == BITRATE_KBPS_V1[1]  # first frame
        # the r5-advice VBR honesty fields: flag + exact average
        assert m["is_cbr"] is False
        want = sum(BITRATE_KBPS_V1[i] for i in (1, 9, 14, 5)) / 4
        assert m["avg_bitrate_kbps"] == want

    def test_cbr_stream_flags_cbr(self):
        from etl_pipelines_spark.multimodal.mp3 import (
            parse_mp3_meta,
            synth_mp3_payload,
        )

        m = parse_mp3_meta(synth_mp3_payload(7, n_frames=5))
        assert m["is_cbr"] is True
        assert m["avg_bitrate_kbps"] == float(m["bitrate_kbps"])

    def test_id3v2_footer_flag_adds_ten_bytes(self):
        """Header flag bit 4 (ID3v2.4 §3.4): a footer trails the tag
        and is NOT counted in the syncsafe size — the frame walk
        must start 10 bytes later."""
        from etl_pipelines_spark.multimodal.mp3 import parse_mp3_meta

        flen = 144000 * 128 // 44100
        frame = bytes([0xFF, 0xFB, (9 << 4), 0]) + b"\x00" * (flen - 4)
        body = b"X" * 20
        tag = (
            b"ID3\x04\x00\x10"  # flags: footer present
            + bytes([0, 0, 0, 20])
            + body
            + b"3DI\x04\x00\x10" + bytes([0, 0, 0, 20])  # footer
        )
        m = parse_mp3_meta(tag + frame * 3)
        assert m["n_frames"] == 3
        assert m["has_id3"] is True

    def test_trailing_id3v1_tag_tolerated(self):
        """A 128-byte trailing 'TAG' block (ID3v1) must not read as
        'trailing garbage' — ubiquitous on real files."""
        from etl_pipelines_spark.multimodal.mp3 import (
            parse_mp3_meta,
            synth_mp3_payload,
        )

        buf = synth_mp3_payload(3, n_frames=4)  # odd id: no ID3v2
        m = parse_mp3_meta(buf + b"TAG" + b"\x00" * 125)
        assert m["n_frames"] == 4
        assert m["has_id3"] is True
        # a short trailing block is still garbage
        with pytest.raises(ValueError):
            parse_mp3_meta(buf + b"TAG" + b"\x00" * 60)

    def test_mpeg2_halves_samples_per_frame(self):
        """MPEG-2 Layer III: 576 samples/frame and the V2 bitrate
        table; duration must reflect both."""
        from etl_pipelines_spark.multimodal.mp3 import parse_mp3_meta

        # version bits 10 (MPEG2), layer III, br_idx 4 (32 kbps V2),
        # sr_idx 1 (24000 Hz)
        flen = 72000 * 32 // 24000
        hdr = bytes([0xFF, 0xF3, (4 << 4) | (1 << 2), 0])
        buf = (hdr + b"\x00" * (flen - 4)) * 10
        m = parse_mp3_meta(buf)
        assert m["version"] == "MPEG2"
        assert m["n_frames"] == 10
        assert m["sample_rate"] == 24000
        assert m["duration_ms"] == 10 * 576 * 1000 // 24000

    def test_garbage_raises(self):
        from etl_pipelines_spark.multimodal.mp3 import (
            parse_mp3_meta,
            synth_mp3_payload,
        )

        with pytest.raises(ValueError):
            parse_mp3_meta(b"RIFF" + b"\x00" * 40)
        # truncated final frame
        buf = synth_mp3_payload(3, n_frames=2)
        with pytest.raises(ValueError):
            parse_mp3_meta(buf[:-5])
        # invalid bitrate index 15
        with pytest.raises(ValueError):
            parse_mp3_meta(bytes([0xFF, 0xFB, 0xF0, 0]) + b"\x00" * 100)

    def test_free_format_is_honest_stub(self):
        from etl_pipelines_spark.multimodal.mp3 import parse_mp3_meta

        with pytest.raises(NotImplementedError):
            parse_mp3_meta(bytes([0xFF, 0xFB, 0x00, 0]) + b"\x00" * 100)


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
