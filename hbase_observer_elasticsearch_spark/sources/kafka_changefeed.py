"""Kafka changefeed source surface (SURVEY §2.3 sources, optional).

A production deployment feeds the CDC pipeline from a Kafka topic of
mutation events (key = rowkey bytes, value = JSON). This module keeps the
whole Kafka-specific surface in one place:

- `kafka_reader_options` — the readStream option map. `maxOffsetsPerTrigger`
  is the streaming analog of the reference's MAX_BULK_COUNT size trigger
  (observer6/ElasticSearchBulkOperator.java:26): it caps mutations per
  micro-batch the way the bulk buffer capped actions per flush.
- `parse_kafka_changefeed` — projects Kafka's (key, value, timestamp)
  binary records onto CHANGEFEED_SCHEMA via `from_json`. Pure column
  expressions, so it is unit-testable (and tested) without a broker.
- `read_kafka_changefeed` — wires both onto `spark.readStream` (requires
  the spark-sql-kafka package at runtime; this container ships none, so
  tests cover the option map and the projection, not the socket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .changefeed import CHANGEFEED_SCHEMA

MAX_BULK_COUNT = 10_000  # reference parity (ElasticSearchBulkOperator.java:26)

# the JSON value payload: everything but the rowkey (which rides as the key)
_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("qualifier", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = MAX_BULK_COUNT,
) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        "failOnDataLoss": "false",
    }


def parse_kafka_changefeed(records: DataFrame) -> DataFrame:
    """(key binary, value binary[, timestamp]) → CHANGEFEED_SCHEMA rows.

    rowkey = UTF-8 of the Kafka key (the reference's `new String(getRow())`,
    HbaseDataSyncEsObserver.java:87); missing event-time falls back to the
    broker timestamp so watermarks always have a clock.
    """
    v = F.from_json(F.col("value").cast("string"), _VALUE_SCHEMA).alias("v")
    with_v = records.select(
        F.col("key").cast("string").alias("rowkey"),
        v,
        *(["timestamp"] if "timestamp" in records.columns else []),
    )
    ts = (
        F.coalesce(F.col("v.ts"), F.col("timestamp"))
        if "timestamp" in records.columns
        else F.col("v.ts")
    )
    return with_v.select(
        F.col("v.seq").alias("seq"),
        F.col("v.op").alias("op"),
        "rowkey",
        F.col("v.family").alias("family"),
        F.col("v.qualifier").alias("qualifier"),
        F.col("v.value").alias("value"),
        ts.alias("ts"),
    ).select(*[f.name for f in CHANGEFEED_SCHEMA.fields])


def read_kafka_changefeed(
    spark: SparkSession, bootstrap_servers: str, topic: str, **opts
) -> DataFrame:
    """Streaming changefeed from Kafka (needs spark-sql-kafka on the
    classpath — unavailable in this container; see module docstring)."""
    reader = spark.readStream.format("kafka")
    for k, val in kafka_reader_options(bootstrap_servers, topic, **opts).items():
        reader = reader.option(k, val)
    return parse_kafka_changefeed(reader.load())
