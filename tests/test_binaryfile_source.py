"""binaryFile raw-media ingestion (sources/binaryfile.py).

Pins: one row per file with the bytes intact; glob pruning at listing
time; recursive lookup; format sniff; and the end-to-end composition
binaryFile read -> media_catalog -> real PNG decode — i.e. a
directory of actual image files becomes decoded pixel stats without
any row leaving the executor tier.
"""

from __future__ import annotations

import os

import pytest

from etl_pipelines_spark.multimodal.binary import _png_codec
from etl_pipelines_spark.sources import media_catalog, read_binary_files


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    """A media dump: 3 real PNGs (repo codec), one WAV-ish RIFF, one
    junk file, plus a nested subdir with one more PNG."""
    import numpy as np

    root = tmp_path_factory.mktemp("media")
    encode, _ = _png_codec()
    for i in range(3):
        arr = np.full((4 + i, 5, 3), [10 * i, 20, 30], dtype=np.uint8)
        (root / f"img_{i}.png").write_bytes(encode(arr))
    (root / "clip.wav").write_bytes(b"RIFF" + b"\x00" * 40)
    (root / "notes.txt").write_bytes(b"not media")
    sub = root / "nested"
    sub.mkdir()
    arr = np.full((2, 2, 3), [1, 2, 3], dtype=np.uint8)
    (sub / "img_9.png").write_bytes(encode(arr))
    return str(root)


class TestReadBinaryFiles:
    def test_one_row_per_file_with_exact_bytes(self, spark, media_dir):
        rows = read_binary_files(spark, media_dir).collect()
        by_name = {os.path.basename(r.path): r for r in rows}
        assert set(by_name) == {
            "img_0.png", "img_1.png", "img_2.png", "clip.wav", "notes.txt"
        }
        want = open(os.path.join(media_dir, "img_1.png"), "rb").read()
        got = bytes(by_name["img_1.png"].content)
        assert got == want
        assert by_name["img_1.png"].length == len(want)

    def test_glob_prunes_at_listing(self, spark, media_dir):
        df = read_binary_files(spark, media_dir, glob="*.png")
        names = {os.path.basename(r.path) for r in df.collect()}
        assert names == {"img_0.png", "img_1.png", "img_2.png"}
        # pruning happens in the file index: the scan's input files
        # must already exclude non-matching paths
        files = df.inputFiles()
        assert all(f.endswith(".png") for f in files)

    def test_recursive_lookup(self, spark, media_dir):
        names = {
            os.path.basename(r.path)
            for r in read_binary_files(
                spark, media_dir, glob="*.png", recursive=True
            ).collect()
        }
        assert "img_9.png" in names and len(names) == 4


class TestMediaCatalog:
    def test_format_sniff_and_stable_ids(self, spark, media_dir):
        cat = media_catalog(spark, media_dir).collect()
        fmt = {os.path.basename(r.path): r.detected_format for r in cat}
        assert fmt["img_0.png"] == "png"
        assert fmt["clip.wav"] == "riff"
        assert fmt["notes.txt"] == "unknown"
        ids1 = {r.path: r.media_id for r in cat}
        ids2 = {
            r.path: r.media_id
            for r in media_catalog(spark, media_dir).collect()
        }
        assert ids1 == ids2  # deterministic across reads

    def test_catalog_feeds_real_png_decode(self, spark, media_dir):
        """End-to-end: directory of real PNG files -> catalog ->
        decode tier -> closed-form pixel stats."""
        from etl_pipelines_spark.multimodal.binary import decode_png_image

        cat = media_catalog(spark, media_dir, glob="*.png")
        decoded = {
            r.media_id: r
            for r in decode_png_image(
                cat.select("media_id", "payload")
            ).collect()
        }
        by_id = {r.media_id: os.path.basename(r.path) for r in cat.collect()}
        assert len(decoded) == 3
        for mid, r in decoded.items():
            i = int(by_id[mid].split("_")[1].split(".")[0])
            assert (r.height, r.width, r.channels) == (4 + i, 5, 3)
            assert (r.mean_r, r.mean_g, r.mean_b) == (10.0 * i, 20.0, 30.0)
