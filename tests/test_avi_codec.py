"""MJPEG-in-AVI: real per-frame video decode (multimodal/avi.py).

The synthesis writes genuine AVIs (RIFF headers, real baseline JPEG
frames, idx1 index); the parser walk is loud on every inconsistency;
the decode is EXACT (solid-gray DC-only frames round-trip losslessly
through the flat-8 JPEG quantizer)."""
from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.multimodal.avi import (
    decode_avi_frames,
    parse_avi_mjpeg,
    synth_avi_mjpeg_payload,
    synth_avi_payloads,
)
from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec


class TestContainer:
    def test_round_trip_meta_and_frames(self):
        buf = synth_avi_mjpeg_payload(7, 12, 9, 3, 40000)
        meta = parse_avi_mjpeg(buf)
        assert (meta["width"], meta["height"]) == (12, 9)
        assert meta["us_per_frame"] == 40000
        assert meta["codec"] == "MJPG"
        assert [k for k, _o, _s in meta["frames"]] == [0, 1, 2]

    def test_frames_decode_exactly(self):
        _, dec = _jpeg_codec()
        mid, w, h = 250, 19, 15  # luma wraps past 255 across frames
        buf = synth_avi_mjpeg_payload(mid, w, h, 8, 10000)
        meta = parse_avi_mjpeg(buf)
        for k, off, size in meta["frames"]:
            img = dec(buf[off : off + size])
            assert img.shape == (h, w, 1)
            assert int(img.astype(np.int64).sum()) == w * h * (
                (mid + k) % 256
            )

    def test_every_frame_is_a_standalone_jpeg(self):
        buf = synth_avi_mjpeg_payload(3, 8, 8, 2, 20000)
        meta = parse_avi_mjpeg(buf)
        for _k, off, size in meta["frames"]:
            frame = buf[off : off + size]
            assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"

    @pytest.mark.parametrize(
        "mutate,msg",
        [
            (lambda b: b[:20], "RIFF size"),
            (lambda b: b"RIFF" + b[4:8] + b"WAVE" + b[12:], "not a RIFF"),
            (lambda b: b.replace(b"MJPG", b"H264", 1), "not MJPEG"),
        ],
    )
    def test_loud_on_corruption(self, mutate, msg):
        buf = synth_avi_mjpeg_payload(1, 8, 8, 2, 20000)
        with pytest.raises(ValueError, match=msg):
            parse_avi_mjpeg(mutate(buf))

    def test_idx1_mismatch_is_loud(self):
        buf = bytearray(synth_avi_mjpeg_payload(1, 8, 8, 2, 20000))
        i = buf.find(b"idx1")
        # corrupt the first index entry's offset field
        off_pos = i + 8 + 8
        struct.pack_into("<I", buf, off_pos, 9999)
        with pytest.raises(ValueError, match="idx1 disagrees"):
            parse_avi_mjpeg(bytes(buf))

    def test_frame_count_mismatch_is_loud(self):
        buf = bytearray(synth_avi_mjpeg_payload(1, 8, 8, 3, 20000))
        i = buf.find(b"avih")
        struct.pack_into("<I", buf, i + 8 + 16, 5)  # dwTotalFrames
        with pytest.raises(ValueError, match="dwTotalFrames"):
            parse_avi_mjpeg(bytes(buf))


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def media(self, spark):
        base = spark.range(0, 12).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
            (F.pmod("id", 4) + 2).cast("int").alias("n_frames"),
            ((F.pmod("id", 5) + 1) * 10000).cast("int").alias(
                "us_per_frame"
            ),
        )
        return synth_avi_payloads(base).cache()

    def test_decode_all_frames(self, spark, media):
        rows = decode_avi_frames(media).orderBy(
            "media_id", "frame_idx"
        ).collect()
        assert len(rows) == sum(i % 4 + 2 for i in range(12))
        for r in rows:
            mid = r.media_id
            assert r.width == mid % 16 + 4
            assert r.height == mid % 12 + 4
            assert r.sum_luma == r.width * r.height * ((mid + r.frame_idx) % 256)
            assert r.ts_ms == r.frame_idx * (mid % 5 + 1) * 10

    def test_sample_every_decodes_subset(self, spark, media):
        rows = decode_avi_frames(media, sample_every=2).collect()
        assert rows and all(r.frame_idx % 2 == 0 for r in rows)
        full = decode_avi_frames(media).count()
        assert len(rows) < full

    def test_plan_is_narrow(self, spark, media):
        plan = decode_avi_frames(media)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # bytes never shuffle

    def test_fused_equals_two_stage_and_plans_narrow(self, spark):
        """ADVICE r12 #1: the AVI fusion uniquely threads
        sample_every through a lambda factory — prove the fused
        single-Python-stage form returns exactly the two-stage
        rows with sample_every=2, and that the fused plan itself is
        narrow (no Exchange, ONE MapInPandas; the query-level range
        exchange lives in range_feed, upstream of the fusion)."""
        from etl_pipelines_spark.multimodal import (
            synth_decode_avi_frames,
        )

        base = spark.range(0, 12).select(
            F.col("id").alias("media_id"),
            (F.pmod("id", 16) + 4).cast("int").alias("width"),
            (F.pmod("id", 12) + 4).cast("int").alias("height"),
            (F.pmod("id", 4) + 2).cast("int").alias("n_frames"),
            ((F.pmod("id", 5) + 1) * 10000).cast("int").alias(
                "us_per_frame"
            ),
        )
        two = decode_avi_frames(
            synth_avi_payloads(base), sample_every=2
        )
        fused = synth_decode_avi_frames(base, sample_every=2)
        key = sorted(two.columns)
        assert sorted(map(repr, two.select(*key).collect())) == sorted(
            map(repr, fused.select(*key).collect())
        )
        plan = fused._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 1
