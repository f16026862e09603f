"""Raw media-file ingestion via Spark's binaryFile source (SURVEY.md
§2.1 ingest tier; multimodal corpus building).

The reference's collection feeds land media as OBJECTS in a bucket and
register pointers in the warehouse (media URLs ride as plain columns —
e.g. the product-image fields of 8_vds/11_variants.sql). A multimodal
training pipeline needs the bytes themselves on the cluster. Spark's
built-in ``binaryFile`` source is the scale-correct way in:

- each file becomes one row (path, modificationTime, length, content)
  read directly by executors — the driver only lists paths;
- listing parallelizes over the directory tree, and
  ``spark.sql.files.maxPartitionBytes`` / file-count packing spread
  files across tasks, so a 100 TB image dump fans out like any scan;
- NO decode on ingest: content stays an opaque binary column exactly
  like the engine's synthetic payloads, so the whole existing
  multimodal tier (extract_binary_meta magic sniff, decode_ppm_image /
  decode_wav_audio / png decode, patch/frame/segment plans) composes
  unchanged downstream of the read.

Caveat pinned in tests: binaryFile caps single files at
``spark.sql.sources.binaryFile.maxLength`` (2 GiB, an int) — larger
blobs (long videos) must be chunk-ingested upstream or referenced and
range-read inside mapInPandas; filter with pathGlobFilter at the
source so pruning happens during listing, not after materializing
bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """One row per file: (path, modificationTime, length, content).
    ``glob`` (e.g. ``*.png``) prunes during directory LISTING —
    files that don't match are never opened."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def media_catalog(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest + catalog in one plan: binaryFile read with the engine's
    magic-byte format sniff attached (JVM expressions, no UDF) and a
    stable doc id (xxhash64 of the path — deterministic across runs,
    partition-free). Columns: media_id, path, length, payload,
    detected_format. The payload column feeds the decode tier
    (multimodal.binary) unchanged."""
    files = read_binary_files(spark, path, glob=glob, recursive=recursive)
    magic = F.hex(F.substring("content", 1, 4))
    return files.select(
        F.xxhash64("path").alias("media_id"),
        "path",
        F.col("length").cast("long").alias("length"),
        F.col("content").alias("payload"),
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("47494638"), "gif")
        .when(magic.startswith("52494646"), "riff")
        .when(F.substring("content", 1, 2) == F.lit(b"P6"), "ppm")
        .otherwise("unknown")
        .alias("detected_format"),
    )
