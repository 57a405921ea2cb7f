"""Table profiling / data-quality health checks [NORTH-STAR].

The pipeline-health pass a 100 TB ingest runs per partition before
promoting data: per-column null rates, exact distinct counts, ranges.
One full scan computes every statistic (multi-aggregate, map-side
partials) — never one pass per column.

Also here: the LATERAL correlated-subquery surface (`spark.sql` text),
proving the engine's SQL face matches DuckDB's on a correlated top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..registry import register
from ..session import ensure_session_conf


@register(
    "profile_table_stats",
    oracle="""
SELECT 'documents' AS tbl,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT(text) AS null_text,
       COUNT(*) - COUNT(lang) AS null_lang,
       COUNT(DISTINCT lang) AS ndv_lang,
       COUNT(DISTINCT source) AS ndv_source,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
""",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of the corpus table: row count, null
    counts, exact NDVs, ranges, volume. All statistics ride ONE
    aggregation (map-side partials + a single-row final), the shape that
    profiles a 100 TB table in one pass; at that scale the exact NDVs
    swap for approx_count_distinct without touching the plan shape.
    """
    ensure_session_conf(spark)
    d = load_table(spark, sf_dir, "documents")
    cnt = F.count(F.lit(1))
    return d.agg(
        F.lit("documents").alias("tbl"),
        cnt.alias("n_rows"),
        (cnt - F.count("text")).alias("null_text"),
        (cnt - F.count("lang")).alias("null_lang"),
        F.countDistinct("lang").alias("ndv_lang"),
        F.countDistinct("source").alias("ndv_source"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "lateral_topk_per_customer",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_mktsegment = 'MACHINERY'
""",
)
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in SQL TEXT (not the DataFrame API):
    each MACHINERY customer's top-2 orders by price. Exercises the
    engine's SQL face — Catalyst decorrelates the LATERAL into the same
    join + per-key window top-k a DataFrame author would write, so the
    declarative-SQL path and the DataFrame path converge on one physical
    plan shape at any scale.
    """
    ensure_session_conf(spark)
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'MACHINERY'
        """
    )


HIST_WIDTH = 25.0
HIST_MAX_BUCKET = 19


@register(
    "profile_column_histogram",
    oracle=f"""
WITH b AS (
  SELECT LEAST(CAST(floor(value / {HIST_WIDTH}) AS BIGINT), {HIST_MAX_BUCKET})
           AS bucket
  FROM events
)
SELECT bucket,
       bucket * {HIST_WIDTH} AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) * 1.0
         / (SELECT COUNT(*) FROM events) AS frac
FROM b
GROUP BY bucket
""",
)
def profile_column_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of a numeric column (20 buckets of width 25,
    last bucket open-ended) with mass fractions — the data-profiling
    primitive behind NDV/skew estimation and bucket-pruning decisions.

    Map-side bucket assignment + one tiny-key aggregation; the total for
    the fraction is a 1-row broadcast. At 100 TB this is a single scan
    with O(buckets) state — the same pass that would feed ANALYZE-style
    column statistics.
    """
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / HIST_WIDTH).cast("bigint"),
        F.lit(HIST_MAX_BUCKET).cast("bigint"),
    )
    hist = ev.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = ev.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "bucket",
        (F.col("bucket") * HIST_WIDTH).alias("bucket_lo"),
        "n",
        (F.col("n") * F.lit(1.0) / F.col("total")).alias("frac"),
    )
