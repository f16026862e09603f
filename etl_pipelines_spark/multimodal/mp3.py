"""MP3 (MPEG audio Layer III) CONTAINER-LEVEL metadata — a real
frame-header walk, stdlib-only, the same honesty line as the MP4 box
parse (video.py): an MP3 file is a sequence of self-describing
frames, and everything a training-data pipeline selects on —
duration, bitrate, sample rate, channel mode, frame count, ID3
presence — lives in the 4-byte frame headers (ISO 11172-3 §2.4.1.3
/ ISO 13818-3), not in the Huffman-coded granule data. PCM DECODE
stays honestly stubbed (hybrid filterbank + Huffman tables — the
codec-library line; see binary.py:252).

parse_mp3_meta: skip an ID3v2 tag (syncsafe size), then walk frames:
11-bit syncword, version (MPEG1/2/2.5), Layer III, bitrate and
sample-rate table lookups, padding-aware frame length
(144000·kbps/sr + pad for MPEG1, 72000·kbps/sr + pad for MPEG2/2.5
— the samples-per-frame halving), channel mode. Duration is exact
integer arithmetic: total_samples·1000 // sample_rate.

synth_mp3_payload builds a valid fixed-bitrate stream from
id-derived table indices so the registered query's oracle is
closed-form over the SAME Python tables rendered as SQL literals
(the occupancy-ladder discipline: one source of truth, two
renderings).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Layer III bitrate table, kbps, index 1..14 (0 = "free format",
# 15 = invalid). ISO 11172-3 Table B.1 / ISO 13818-3.
BITRATE_KBPS_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATE_KBPS_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

# sample-rate table by version group, index 0..2 (3 = invalid).
SAMPLE_RATES = {
    1: [44100, 48000, 32000],     # MPEG-1
    2: [22050, 24000, 16000],     # MPEG-2
    25: [11025, 12000, 8000],     # MPEG-2.5
}

_VERSION_BITS = {0b00: 25, 0b10: 2, 0b11: 1}  # 0b01 reserved


def _id3v2_len(buf: bytes) -> int:
    """Length of a leading ID3v2 tag (0 if absent) — 10-byte header
    + syncsafe 28-bit size (ID3v2.4 §3.1) + 10-byte footer when
    header flag bit 4 is set (§3.4: the footer is NOT counted in the
    syncsafe size)."""
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    size = 0
    for b in buf[6:10]:
        if b & 0x80:
            raise ValueError("corrupt ID3v2 syncsafe size")
        size = (size << 7) | b
    footer = 10 if buf[5] & 0x10 else 0
    return 10 + size + footer


def _frame_header(buf: bytes, pos: int):
    """Parse one 4-byte frame header at pos -> (version_group,
    bitrate_kbps, sample_rate, channels, frame_len, samples)."""
    b1, b2, b3 = buf[pos + 1], buf[pos + 2], buf[pos + 3]
    ver = _VERSION_BITS.get((b1 >> 3) & 0x3)
    if ver is None:
        raise ValueError("reserved MPEG version")
    layer = (b1 >> 1) & 0x3
    if layer != 0b01:  # Layer III only — this is an MP3 parser
        raise NotImplementedError("not Layer III")
    br_idx = (b2 >> 4) & 0xF
    if br_idx == 0xF:
        raise ValueError("invalid bitrate index")
    if br_idx == 0:
        raise NotImplementedError("free-format bitrate")
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("invalid sample-rate index")
    kbps = (BITRATE_KBPS_V1 if ver == 1 else BITRATE_KBPS_V2)[br_idx]
    sr = SAMPLE_RATES[ver][sr_idx]
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    channels = 1 if mode == 0b11 else 2
    if ver == 1:  # 1152 samples/frame -> 144·bitrate/sr
        frame_len = 144000 * kbps // sr + padding
        samples = 1152
    else:  # MPEG-2/2.5 Layer III: 576 samples/frame
        frame_len = 72000 * kbps // sr + padding
        samples = 576
    return ver, kbps, sr, channels, frame_len, samples


def parse_mp3_meta(buf: bytes) -> dict:
    """Frame-header walk -> container metadata dict; raises
    ValueError on non-MP3 bytes. All fields exact integers."""
    id3 = _id3v2_len(buf)
    pos = id3
    if pos + 4 > len(buf) or buf[pos] != 0xFF or (buf[pos + 1] & 0xE0) != 0xE0:
        raise ValueError("no MP3 syncword")
    n_frames = 0
    total_samples = 0
    kbps_sum = 0
    first = None
    is_cbr = True
    has_id3v1 = False
    while pos + 4 <= len(buf):
        # trailing 128-byte ID3v1 'TAG' block (very common on real
        # files) — record and stop, it is not frame data
        if buf[pos : pos + 3] == b"TAG" and len(buf) - pos == 128:
            has_id3v1 = True
            pos = len(buf)
            break
        if buf[pos] != 0xFF or (buf[pos + 1] & 0xE0) != 0xE0:
            raise ValueError(f"lost sync at byte {pos}")
        ver, kbps, sr, ch, frame_len, samples = _frame_header(buf, pos)
        if first is None:
            first = (ver, kbps, sr, ch)
        elif (ver, sr) != (first[0], first[2]):
            raise ValueError("version/sample-rate change mid-stream")
        if kbps != first[1]:
            is_cbr = False
        if pos + frame_len > len(buf):
            raise ValueError("truncated final frame")
        n_frames += 1
        total_samples += samples
        kbps_sum += kbps
        pos += frame_len
    if pos != len(buf):
        raise ValueError("trailing garbage after last frame")
    ver, kbps, sr, ch = first
    return {
        "version": {1: "MPEG1", 2: "MPEG2", 25: "MPEG2.5"}[ver],
        "n_frames": n_frames,
        # first-frame bitrate; meaningful alone only when is_cbr —
        # VBR selection filters should use avg_bitrate_kbps
        "bitrate_kbps": kbps,
        # exact per-frame average, the honest figure for VBR streams
        "avg_bitrate_kbps": kbps_sum / n_frames,
        "is_cbr": is_cbr,
        "sample_rate": sr,
        "channels": ch,
        "duration_ms": total_samples * 1000 // sr,
        "has_id3": id3 > 0 or has_id3v1,
    }


def synth_mp3_payload(media_id: int, n_frames: int) -> bytes:
    """Valid CBR MPEG-1 Layer III stream with id-derived table
    indices (bitrate index 1..14, sample-rate index 0..2, mono/
    stereo), zero-filled granule data, and an ID3v2 tag on even ids
    — every derived field closed-form for the oracle."""
    br_idx = media_id % 14 + 1
    sr_idx = media_id % 3
    mono = media_id % 2 == 0
    kbps = BITRATE_KBPS_V1[br_idx]
    sr = SAMPLE_RATES[1][sr_idx]
    frame_len = 144000 * kbps // sr
    hdr = bytes([
        0xFF,
        0xFB,  # sync + MPEG1 + Layer III + no CRC
        (br_idx << 4) | (sr_idx << 2),
        (0b11 << 6) if mono else 0,  # mode: single_channel / stereo
    ])
    frame = hdr + b"\x00" * (frame_len - 4)
    id3 = b""
    if media_id % 2 == 0:
        payload = b"TAG8" + bytes(16)  # arbitrary tag body
        sz = len(payload)
        id3 = b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + payload
    return id3 + frame * n_frames


_MP3_SYNTH_COLS = ["media_id", "n_frames"]
_MP3_META_SCHEMA = (
    "media_id long, version string, n_frames long, "
    "bitrate_kbps int, is_cbr boolean, sample_rate int, "
    "channels int, duration_ms long, has_id3 boolean"
)


def _mp3_synth_gen():
    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synth_mp3_payload(int(m), int(n))
                for m, n in zip(pdf["media_id"], pdf["n_frames"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return _gen


def synth_mp3_payloads(df: DataFrame) -> DataFrame:
    """(media_id, n_frames) -> real MP3 bytes."""
    return df.select(*_MP3_SYNTH_COLS).mapInPandas(
        _mp3_synth_gen(), schema="media_id long, payload binary"
    )


def _mp3_meta_gen():
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {k: [] for k in (
                "media_id", "version", "n_frames", "bitrate_kbps",
                "is_cbr", "sample_rate", "channels", "duration_ms",
                "has_id3")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                m = parse_mp3_meta(bytes(payload))
                rows["media_id"].append(mid)
                for k in ("version", "n_frames", "bitrate_kbps",
                          "is_cbr", "sample_rate", "channels",
                          "duration_ms", "has_id3"):
                    rows[k].append(m[k])
            yield pd.DataFrame(rows)

    return _extract


def extract_mp3_meta(df: DataFrame) -> DataFrame:
    """Frame-walk metadata extraction as a narrow Arrow map —
    integer/string/bool columns only, exact across engines."""
    return df.select("media_id", "payload").mapInPandas(
        _mp3_meta_gen(), schema=_MP3_META_SCHEMA
    )


def synth_extract_mp3_meta(df: DataFrame) -> DataFrame:
    """synth_mp3_payloads → extract_mp3_meta fused into ONE Python
    stage (binary.fuse_pandas_stages): the MP3 bytes never cross the
    JVM↔Python boundary. Same output, same oracle."""
    from .binary import fuse_pandas_stages

    return fuse_pandas_stages(
        df, _mp3_synth_gen, _mp3_meta_gen,
        _MP3_SYNTH_COLS, _MP3_META_SCHEMA,
    )
