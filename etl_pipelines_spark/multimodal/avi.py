"""REAL video-frame decode: MJPEG inside AVI (RIFF), zero codec
libraries.

The reference's media tier treats video as opaque blobs with typed
metadata (SURVEY §2.11); every prior round's frame DECODE stub said
"H.264 entropy coding genuinely needs a codec lib". That is true for
H.264 — but Motion-JPEG does not need one: each frame is a complete
baseline JPEG, and this repo already ships a real baseline JPEG codec
(multimodal/jpeg.py — Huffman, dequant, exact IDCT). So the honest
frame-decode claim this engine CAN make is MJPEG: parse the AVI RIFF
container (public Microsoft 'AVI RIFF File Reference' layout:
RIFF('AVI ') -> LIST'hdrl'(avih, LIST'strl'(strh,strf)) ->
LIST'movi'('00dc' frames) -> 'idx1'), slice each '00dc' chunk, and
run the JPEG decoder on it.

Synthesis writes frames as solid-gray JPEGs at luma
``(media_id + frame_idx) % 256`` — DC-only blocks under flat-8
quantization round-trip EXACTLY (the mm_jpeg_decode invariant), so
each decoded frame's pixel sum is the closed-form
``width * height * ((media_id + frame_idx) % 256)`` and the driver
oracle needs zero tolerance.

Scale: one narrow ``mapInPandas`` per direction; payload bytes never
cross an exchange. Frame sampling (``sample_every``) happens INSIDE
the Arrow batch, so a sample-1-in-30 training pipeline decodes 1/30th
of the frames without shuffling any video bytes.
"""
from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .jpeg import _jpeg_codec

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def synth_avi_mjpeg_payload(
    media_id: int,
    width: int,
    height: int,
    n_frames: int,
    us_per_frame: int,
) -> bytes:
    """A genuine playable MJPEG AVI: real headers, real JPEG frames
    (solid gray ``(media_id + k) % 256``), real idx1 index."""
    encode, _ = _jpeg_codec()
    import numpy as np

    jpegs = [
        encode(
            np.full((height, width), (media_id + k) % 256, np.uint8)
        )
        for k in range(n_frames)
    ]

    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10,  # dwFlags: AVIF_HASINDEX
        n_frames, 0, 1, max(len(j) for j in jpegs),
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIii",
            0, 0, 0, 0,
            1, 1_000_000 // us_per_frame,  # dwScale / dwRate
            0, n_frames, max(len(j) for j in jpegs), -1, 0,
        )
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_payload), len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def parse_avi_mjpeg(buf: bytes) -> dict:
    """Strict RIFF walk. Returns {width, height, us_per_frame,
    n_frames, codec, frames: [(frame_idx, abs_offset, size)]} with
    the idx1 index cross-checked against the movi chunk walk — any
    inconsistency raises ValueError (loud-stop: a silently-wrong
    frame table corrupts every downstream sample)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = struct.unpack("<I", buf[4:8])[0]
    if riff_size + 8 != len(buf):
        raise ValueError("RIFF size != stream length")

    meta: dict = {"codec": None}
    frames: list[tuple[int, int, int]] = []
    idx1: list[tuple[int, int]] = []
    movi_fourcc_pos: int | None = None

    def walk(start: int, end: int) -> None:
        nonlocal movi_fourcc_pos
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise ValueError("truncated chunk header")
            fourcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body = pos + 8
            if body + size > end:
                raise ValueError("chunk overruns parent")
            if fourcc == b"LIST":
                ltype = buf[body : body + 4]
                if ltype == b"movi":
                    movi_fourcc_pos = body
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("avih too short")
                v = struct.unpack("<10I", buf[body : body + 40])
                meta["us_per_frame"], meta["n_frames"] = v[0], v[4]
                meta["width"], meta["height"] = v[8], v[9]
            elif fourcc == b"strh":
                if buf[body : body + 4] == b"vids":
                    meta["codec"] = buf[body + 4 : body + 8].decode(
                        "ascii", "replace"
                    )
            elif fourcc[2:] in (b"dc", b"db"):
                frames.append((len(frames), body, size))
            elif fourcc == b"idx1":
                for e in range(body, body + size, 16):
                    ckid = buf[e : e + 4]
                    _fl, off, sz = struct.unpack(
                        "<III", buf[e + 4 : e + 16]
                    )
                    if ckid[2:] in (b"dc", b"db"):
                        idx1.append((off, sz))
            pos = body + size + (size % 2)

    walk(12, len(buf))
    if "us_per_frame" not in meta:
        raise ValueError("missing avih header")
    if meta["codec"] != "MJPG":
        raise ValueError(f"not MJPEG: {meta['codec']}")
    if meta["n_frames"] != len(frames):
        raise ValueError(
            f"avih dwTotalFrames {meta['n_frames']} != "
            f"{len(frames)} movi chunks"
        )
    if idx1:
        if movi_fourcc_pos is None:
            raise ValueError("idx1 without a movi list")
        if len(idx1) != len(frames):
            raise ValueError("idx1 entry count != movi chunks")
        for (off, sz), (_k, abs_off, size) in zip(idx1, frames):
            if movi_fourcc_pos + off + 8 != abs_off or sz != size:
                raise ValueError("idx1 disagrees with movi walk")
    meta["frames"] = frames
    return meta


_AVI_SYNTH_COLS = ["media_id", "width", "height", "n_frames", "us_per_frame"]
_AVI_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, "
    "width int, height int, sum_luma long"
)


def _avi_synth_gen():
    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, w, h, n, upf in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["us_per_frame"],
            ):
                ids.append(mid)
                payloads.append(
                    synth_avi_mjpeg_payload(
                        int(mid), int(w), int(h), int(n), int(upf)
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return _synth


def synth_avi_payloads(df: DataFrame) -> DataFrame:
    """(media_id, width, height, n_frames, us_per_frame) ->
    (media_id, payload): a real MJPEG AVI per row."""
    return df.select(*_AVI_SYNTH_COLS).mapInPandas(
        _avi_synth_gen(), schema="media_id long, payload binary"
    )


def _avi_frames_gen(sample_every: int = 1):
    _, jpeg_decode = _jpeg_codec()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "frame_idx", "ts_ms",
                "width", "height", "sum_luma")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                meta = parse_avi_mjpeg(buf)
                upf = meta["us_per_frame"]
                for k, off, size in meta["frames"]:
                    if k % sample_every:
                        continue
                    img = jpeg_decode(buf[off : off + size])
                    h, w, _c = img.shape
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k)
                    rows["ts_ms"].append(k * upf // 1000)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_luma"].append(
                        int(img.astype(np.int64).sum())
                    )
            yield pd.DataFrame(rows)

    return _decode


def decode_avi_frames(df: DataFrame, sample_every: int = 1) -> DataFrame:
    """REAL per-frame video decode: container walk -> chunk slice ->
    baseline-JPEG decode -> exact integer luma sum per frame. One row
    per (kept) frame: media_id, frame_idx, ts_ms, width, height,
    sum_luma. ``sample_every`` keeps frames where
    ``frame_idx % sample_every == 0`` INSIDE the Arrow batch — the
    1-in-N training-data sampling path decodes only what it keeps."""
    return df.select("media_id", "payload").mapInPandas(
        _avi_frames_gen(sample_every), schema=_AVI_FRAMES_SCHEMA
    )


def synth_decode_avi_frames(df: DataFrame, sample_every: int = 1) -> DataFrame:
    """synth_avi_payloads → decode_avi_frames fused into ONE Python
    stage (binary.fuse_pandas_stages): the AVI container bytes never
    cross the JVM↔Python boundary. Same output, same oracle."""
    from .binary import fuse_pandas_stages

    return fuse_pandas_stages(
        df, _avi_synth_gen, lambda: _avi_frames_gen(sample_every),
        _AVI_SYNTH_COLS, _AVI_FRAMES_SCHEMA,
    )
