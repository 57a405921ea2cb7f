"""Table profiling / data-quality health checks [NORTH-STAR].

The pipeline-health pass a 100 TB ingest runs per partition before
promoting data: per-column null rates, exact distinct counts, ranges.
One full scan computes every statistic (multi-aggregate, map-side
partials) — never one pass per column.

Also here: the LATERAL correlated-subquery surface (`spark.sql` text),
proving the engine's SQL face matches DuckDB's on a correlated top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "profile_key_skew",
    oracle="""
WITH freq AS (
  SELECT l_orderkey AS key, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_orderkey
),
moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt
  FROM freq
),
heavy AS (
  SELECT key, cnt FROM (
    SELECT key, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
    FROM freq
  ) t WHERE rk <= 10
)
SELECT h.key AS hot_key,
       CAST(h.cnt AS BIGINT) AS hot_cnt,
       m.n_keys, m.n_rows, m.max_cnt, m.p99_cnt,
       CAST(m.max_cnt AS DOUBLE) * m.n_keys / m.n_rows AS skew_factor
FROM heavy h CROSS JOIN moments m
""",
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the top-10 heaviest l_orderkey values plus
    corpus-level frequency moments (max, exact p99, skew factor =
    max/mean) — the report a planner (or an engineer) reads to decide
    between a plain shuffle join, AQE skew splitting, and explicit
    salting (join_salted_skew is the treatment; this is the diagnosis).

    Scale shape: one hash aggregation on the key, then two tiny
    reductions (global moments and a top-10 TakeOrdered) over the
    key-frequency table — which is |distinct keys|, already far smaller
    than the fact table. The exact p99 runs over counts, not rows, and
    at 100 TB you'd swap it for approx_percentile with no other change.
    """
    ensure_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    moments = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)")
        .cast("bigint")
        .alias("p99_cnt"),
    )
    w = Window.orderBy(F.col("cnt").desc(), "key")
    heavy = (
        freq.select("key", "cnt", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    return heavy.crossJoin(F.broadcast(moments)).select(
        F.col("key").alias("hot_key"),
        F.col("cnt").cast("bigint").alias("hot_cnt"),
        "n_keys",
        "n_rows",
        "max_cnt",
        "p99_cnt",
        (
            F.col("max_cnt").cast("double")
            * F.col("n_keys")
            / F.col("n_rows")
        ).alias("skew_factor"),
    )
