"""Fixture catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

At 100 TB these would be partitioned/bucketed lakehouse tables; the loader
keeps the access path behind one function so a real catalog (Hive/Iceberg)
can be swapped in without touching operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Fixture columns written as parquet TIMESTAMP(NANOS).  Spark has no nanos
# timestamp type; we read them as long (spark.sql.legacy.parquet.nanosAsLong)
# and truncate to microseconds — exactly what DuckDB's TIMESTAMP does, so
# oracle comparisons agree.
_NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a small single-file input across all cores.

    The fixture tables are one parquet file → one partition, which would
    serialize every downstream per-row compute (UDF decode, HOF vector
    math, shingling) on one core; at 100 TB, skewed file splits do the
    same. One cheap shuffle of the raw rows buys full parallelism for the
    expensive part. The partition count is explicit because AQE would
    coalesce a by-column repartition of a few MB right back to one
    partition — correct for shuffle cost, wrong for compute parallelism.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so SQL-phrased operators can run."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
