"""Bucketed state tables: co-located fact-fact joins with zero shuffle.

At 100 TB the orders⋈lineitem equi-join is the dominant shuffle (SURVEY
§2.3 joins). Writing both facts bucketed by their join key — once, at
ingest — removes that exchange from *every* downstream join: the scan
itself is hash-partitioned, so SortMergeJoin consumes the buckets
directly (`Exchange` disappears from the plan; with `sortBy` at write
time the per-bucket `Sort` disappears too).

This mirrors the reference's implicit layout choice: HBase stores rows
pre-partitioned by rowkey region, which is why its per-region hooks never
need a shuffle (SURVEY §1.1). Bucketing is the lakehouse restatement.

The reader requires ``spark.sql.sources.bucketing.enabled`` (default on)
and bucket counts to match across join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed (and in-bucket sorted) table.

    `path` makes it an external table — tests point it at a tmp dir; a
    production deployment points at the lakehouse location.
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. No repartitioning logic needed here —
    the *absence* of Exchange in the resulting plan is the feature, and
    tests assert it (tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
