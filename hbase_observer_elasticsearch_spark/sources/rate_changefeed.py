"""Rate-source synthetic changefeed: a load generator for the CDC pipeline.

`spark.readStream.format("rate")` emits (timestamp, value) rows at a fixed
rate; this maps them onto CHANGEFEED_SCHEMA deterministically (key space,
op mix, families, qualifiers all derived from `value`), giving an unbounded
mutation stream to soak-test the pipeline without any external system —
the streaming analog of the reference's manual `put`/`deleteall` smoke
script (README_zh.md:382-383).

1 in 8 mutations is a whole-row delete, mirroring a realistic tombstone
ratio; rows/second and key cardinality bound state growth for the LWW
assembly downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_KEYS = 1000
DELETE_EVERY = 8


def rate_changefeed(
    spark: SparkSession,
    rows_per_second: int = 1000,
    n_keys: int = N_KEYS,
    num_partitions: int = 4,
) -> DataFrame:
    """Unbounded synthetic changefeed (CHANGEFEED_SCHEMA) from the rate
    source. Deterministic given the stream's `value` sequence."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(num_partitions))
        .load()
    )
    v = F.col("value")
    is_del = (v % DELETE_EVERY) == 0
    return rate.select(
        v.alias("seq"),
        F.when(is_del, "delete").otherwise("put").alias("op"),
        F.concat(F.lit("r"), (v % n_keys).cast("string")).alias("rowkey"),
        F.when(~is_del, F.lit("info")).alias("family"),
        F.when(~is_del, F.concat(F.lit("c"), (v % 5).cast("string"))).alias(
            "qualifier"
        ),
        F.when(~is_del, F.concat(F.lit("v"), v.cast("string"))).alias("value"),
        F.col("timestamp").alias("ts"),
    )
