"""Opaque-binary media columns over Spark.

Schema convention: a media row is
  (media_id bigint, payload binary, meta struct<mime string,
   width int, height int, duration_ms int>)
— the payload is never interpreted by the engine core; decode /
feature-extract run as Arrow-batched Pandas iterators (mapInPandas)
so bytes stay in columnar batches end-to-end.

Decode is STUBBED: the container ships no codecs. The stubs either
raise NotImplementedError (decode_image) or produce a deterministic
fake (fake_feature_extract: byte-histogram "embedding") so the
plumbing — batch shapes, schemas, partition sizing — is fully
exercised by tests without pretending to decode JPEGs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media-shaped DataFrame from a text table (test
    harness): payload = utf-8 bytes, fake 'image/png' meta derived
    deterministically from the id."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.pmod(F.col(id_col), 640) + 64).cast("int").alias("width"),
            (F.pmod(F.col(id_col), 480) + 48).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """Payload-level metadata without decoding: byte length, sha256,
    magic-byte sniff (per-row JVM expressions, no UDF)."""
    magic = F.hex(F.substring("payload", 1, 4))
    return df.select(
        "media_id",
        "meta",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("47494638"), "gif")
        .when(magic.startswith("52494646"), "riff")
        .otherwise("unknown")
        .alias("sniffed_format"),
    )


def decode_image(df: DataFrame) -> DataFrame:
    """STUB — image decode requires a codec library not present in
    this container. The mapInPandas signature and output schema are
    the real contract; swap the body for PIL/libvips in production.
    """
    out_schema = "media_id long, height int, width int, channels int"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode is stubbed: no codec library in this environment"
        )
        yield  # pragma: no cover — keeps this a generator

    return df.mapInPandas(_decode, schema=out_schema)


def fake_feature_extract(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic FAKE feature extractor (stands in for an image
    embedding model): a normalized byte-value histogram of the
    payload, computed in Arrow batches via mapInPandas. The batch
    iteration, schema handling and scaling behavior are real; only
    the features are fake."""
    out_schema = f"media_id long, features array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                buf = bytes(payload) if payload is not None else b""
                hist = [0.0] * dim
                for byte in buf:
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.mapInPandas(_extract, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    extract (media_id, frame_idx, ts_ms), derived from meta.duration
    — the explode is real; the actual frame grab would join this
    plan to the decoder. Rows with no duration produce no frames."""
    n_frames = F.floor(F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("meta.duration_ms").isNotNull() & (n_frames > 0))
        .select(
            "media_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * every_ms,
                )
            ).alias("frame_idx", "ts_ms"),
        )
    )


def audio_segment_plan(
    df: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio segmentation *plan*: one output row per (overlapping)
    analysis window (media_id, seg_idx, start_ms, end_ms), derived
    from meta.duration_ms with the standard window/hop framing —
    n_segs = floor((duration - window) / hop) + 1. Like
    frame_sample_plan this is the real dataflow half of an audio
    featurizer: the plan joins to the (stubbed) decoder, and the
    explode keeps the segment index (posexplode, the reference's
    line_item_position idiom). Clips shorter than one window yield
    no segments."""
    n_segs = (
        F.floor((F.col("meta.duration_ms") - window_ms) / hop_ms).cast("int") + 1
    )
    return (
        df.filter(
            F.col("meta.duration_ms").isNotNull()
            & (F.col("meta.duration_ms") >= window_ms)
        )
        .select(
            "media_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_segs - 1),
                    lambda i: i * hop_ms,
                )
            ).alias("seg_idx", "start_ms"),
        )
        .withColumn("end_ms", F.col("start_ms") + window_ms)
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """STUB — audio decode (PCM frames from the payload container)
    requires a codec library not present in this container. The
    mapInPandas signature and output schema are the production
    contract; swap the body for soundfile/ffmpeg in production."""
    out_schema = "media_id long, sample_rate int, n_samples long, channels int"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode is stubbed: no codec library in this environment"
        )
        yield  # pragma: no cover — keeps this a generator

    return df.mapInPandas(_decode, schema=out_schema)


def with_resize_dims(
    df: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-fit resize TARGET computation — the real half of a
    resize stage (pure JVM expressions; never upscales). The byte
    transform itself is `resize_image`, stubbed below."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("meta.width"),
        F.lit(float(max_h)) / F.col("meta.height"),
        F.lit(1.0),
    )
    return df.select(
        "*",
        F.greatest(F.floor(F.col("meta.width") * scale), F.lit(1))
        .cast("int")
        .alias("target_width"),
        F.greatest(F.floor(F.col("meta.height") * scale), F.lit(1))
        .cast("int")
        .alias("target_height"),
    )


def resize_image(df: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """STUB — pixel resampling requires a codec/imaging library not
    present in this container. Target dims are computed for real
    (with_resize_dims); the mapInPandas signature and output schema
    (payload replaced by the resized bytes) are the production
    contract — swap the body for PIL `Image.resize` in production."""
    out_schema = "media_id long, payload binary, target_width int, target_height int"
    sized = with_resize_dims(df, max_w, max_h)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize is stubbed: no imaging library in this environment"
        )
        yield  # pragma: no cover — keeps this a generator

    return sized.select(
        "media_id", "payload", "target_width", "target_height"
    ).mapInPandas(_resize, schema=out_schema)
