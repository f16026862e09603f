"""Kafka-wire-shaped stream source (SURVEY.md §2.10 St1 polish).

Reference: Kafka/Kinesis events reach the warehouse as Firehose file
drops, registered every 15 minutes (data-airflow-prod/dags/
kinesis_events/partitions_handler.py:51,66-74) — the reference never
consumes a broker directly. This module keeps that reality while
exposing the EXACT schema contract of Spark's native Kafka source, so
swapping the file fake for `format("kafka")` on a real cluster
changes one reader call and nothing downstream:

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

Downstream decode is the standard pattern: cast value to string,
`from_json` against the declared event schema, surface the Kafka
metadata columns for lineage/dedup (offset-based exactly-once).

At scale: the decode is per-row JVM expressions (no Python), the
(topic, partition, offset) triple is the idempotency key, and the
watermark bounds any stateful consumer downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .incremental import EVENTS_SCHEMA

# JSON payload timestamps carry FULL microsecond precision: Spark's
# default to_json/from_json format is millisecond (SSS) and silently
# truncates the rest.
_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}

KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def read_kafka_shaped_stream(
    spark: SparkSession,
    source: str,
    topics: str = "events",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Read a stream in Kafka wire shape.

    ``source`` starting with ``kafka://`` uses the native Kafka
    source against those bootstrap servers (requires the
    spark-sql-kafka package on the cluster — not shipped in this
    container); anything else is a directory of wire-schema parquet
    files (the Firehose-drop fake, faithful to the reference's actual
    ingestion). Both return the same columns.
    """
    if source.startswith("kafka://"):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", source[len("kafka://"):])
            .option("subscribe", topics)
            .option("startingOffsets", "earliest")
            .load()
        )
    reader = spark.readStream.schema(KAFKA_WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source)


def decode_events(wire: DataFrame) -> DataFrame:
    """value-bytes JSON -> typed event columns + Kafka lineage cols.
    Pure JVM (`from_json`); (topic, partition, offset) ride along as
    the exactly-once dedup key for downstream upserts."""
    return (
        wire.select(
            F.from_json(
                F.col("value").cast("string"), EVENTS_SCHEMA, _TS_OPTS
            ).alias("e"),
            "topic",
            "partition",
            "offset",
            F.col("timestamp").alias("broker_ts"),
        )
        .select("e.*", "topic", "partition", "offset", "broker_ts")
    )


def encode_events_to_wire(events: DataFrame, topic: str = "events") -> DataFrame:
    """Inverse of decode_events — renders typed events as wire rows
    (test fixture / loopback path). Offsets are per-partition
    monotonic like a real broker's."""
    return events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
            _TS_OPTS,
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("event_id"), F.lit(4)).cast("int").alias("partition"),
        F.row_number()
        .over(
            Window.partitionBy(F.pmod(F.col("event_id"), F.lit(4))).orderBy(
                "event_id"
            )
        )
        .cast("long")
        .alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
