"""Query-planning & physical-layout audit operators [NORTH-STAR].

The optimizer-facing side of running at 100 TB: cardinality estimation
(the statistics a CBO would keep, and how wrong each fidelity level is),
sample-driven range partitioning (what ``repartitionByRange`` does
internally, made auditable), and watermark-delay selection for streaming
(how late *would* data be, measured from arrival skew).

Reference parity: the reference (observer6/*.java) has no planner — it
hard-codes flush thresholds (ElasticSearchBulkOperator.java:33-35). These
operators are the north-star engine surface that replaces hard-coded
constants with data-derived plans.

Everything is exact BIGINT / md5 arithmetic (the repo's determinism
discipline): estimates use integer DIV, ratios are single IEEE divisions
of integer operands, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..registry import register
from ..session import ensure_session_conf

# layout_range_partition_balance
RANGE_PARTS = 32  # target partition count (mirrors spark.sql.shuffle.partitions)
# COUNT-bounded boundary sample: the RANGE_PARTS*128 rows with the
# smallest md5 — real RangePartitioner bounds the sample COUNT
# (sampleSizePerPartition), not a fraction, so the boundary sort stays
# O(parts x per-part sample) however large the table is (r8 verdict #6).
SAMPLE_CAP = RANGE_PARTS * 128

# stream_watermark_lateness_audit
JITTER_MOD_US = 600_000_000  # deterministic "network delay": 0..10 min
BLOCK_US = 3_600_000_000  # 1-hour arrival blocks for the distributed prefix-scan
WM_DELAYS_S = (60, 300, 900)  # candidate withWatermark delays to audit


@register(
    "profile_join_cardinality_est",
    oracle="""
WITH ok AS (
  SELECT CAST(o_orderdate AS DATE) AS d, strftime(o_orderdate, '%Y-%m') AS m
  FROM orders
),
lk AS (
  SELECT CAST(l_shipdate AS DATE) AS d, strftime(l_shipdate, '%Y-%m') AS m
  FROM lineitem
),
oc AS (SELECT d, m, CAST(COUNT(*) AS BIGINT) AS c FROM ok GROUP BY d, m),
lc AS (SELECT d, m, CAST(COUNT(*) AS BIGINT) AS c FROM lk GROUP BY d, m),
act AS (
  SELECT CAST(COALESCE(SUM(oc.c * lc.c), 0) AS BIGINT) AS actual_rows
  FROM oc JOIN lc ON oc.d = lc.d
),
tots AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ok) AS n_o,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lk) AS n_l,
         (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM ok) AS ndv_o,
         (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM lk) AS ndv_l
),
om AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c,
              CAST(COUNT(DISTINCT d) AS BIGINT) AS nd
       FROM ok GROUP BY m),
lm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c,
              CAST(COUNT(DISTINCT d) AS BIGINT) AS nd
       FROM lk GROUP BY m),
hist AS (
  SELECT CAST(COALESCE(SUM(om.c * lm.c
                           // GREATEST(om.nd, lm.nd)), 0) AS BIGINT)
           AS est_hist_month
  FROM om JOIN lm ON om.m = lm.m
)
SELECT t.n_o, t.n_l, t.ndv_o, t.ndv_l, a.actual_rows,
       CAST(t.n_o * t.n_l // GREATEST(t.ndv_o, t.ndv_l) AS BIGINT)
         AS est_uniform_ndv,
       h.est_hist_month,
       CAST(GREATEST(t.n_o * t.n_l // GREATEST(t.ndv_o, t.ndv_l),
                     a.actual_rows) AS DOUBLE)
         / LEAST(t.n_o * t.n_l // GREATEST(t.ndv_o, t.ndv_l),
                 a.actual_rows) AS qerr_uniform,
       CAST(GREATEST(h.est_hist_month, a.actual_rows) AS DOUBLE)
         / LEAST(h.est_hist_month, a.actual_rows) AS qerr_hist_month
FROM tots t, act a, hist h
""",
)
def profile_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation at three statistics fidelities — the
    cost-based-optimizer story behind every join-order / broadcast
    decision at 100 TB. The probe join is the *non-key* date join
    orders.o_orderdate = lineitem.l_shipdate (many-to-many), and the
    estimate ladder is:

    1. **uniform-NDV (Selinger)**: |O|·|L| DIV max(ndv) — what an engine
       with only table counts + distinct counts predicts;
    2. **monthly histogram**: Σ_m cO_m·cL_m DIV max(ndv_days_O_m,
       ndv_days_L_m) — equi-time buckets with per-bucket NDV, the
       ANALYZE-level statistic;
    3. **per-key histogram**: Σ_d cO_d·cL_d — lossless; this identity IS
       the actual join count, computed here from the two count tables
       without materializing a single joined row (the same trick lets a
       planner *bound* a join exactly when both MCV lists are complete).

    q-errors (max(est,act)/min) quantify each level's risk. On this
    synthetic corpus the date keys are near-uniform, so the audit
    *certifies* the cheap estimate (qerr ~1.0 at sf0.01) — that
    certification is the operational point: run on skewed production
    keys the same query is the alarm that says "uniform-NDV would
    mis-size this join; keep histograms" (the skewed case is pinned by
    a literal-DataFrame unit test, where uniform-NDV underestimates a
    geometric key by >2x and the month-grain histogram recovers it).
    All estimates are exact BIGINT with integer DIV; each q-error is
    one IEEE division of integer operands — bit-identical across
    engines.

    Scale shape: two date-grain groupBys (map-side combine to |dates|
    rows) and month-grain aggregates over those; the fact tables are
    each scanned once and the estimation itself runs on KB-sized stats
    tables — exactly how a CBO consumes statistics.
    """
    ensure_session_conf(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("d"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    )
    oc = o.groupBy("d", "m").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lc = l.groupBy("d", "m").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    act = (
        oc.select("d", "c")
        .join(lc.select("d", F.col("c").alias("c2")), "d")
        .agg(
            F.coalesce(F.sum(F.col("c") * F.col("c2")), F.lit(0))
            .cast("bigint")
            .alias("actual_rows")
        )
    )
    tots = (
        o.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_o"),
            F.countDistinct("d").cast("bigint").alias("ndv_o"),
        )
        .crossJoin(
            l.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_l"),
                F.countDistinct("d").cast("bigint").alias("ndv_l"),
            )
        )
    )
    om = oc.groupBy("m").agg(
        F.sum("c").cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    lm = lc.groupBy("m").agg(
        F.sum("c").cast("bigint").alias("c2"),
        F.count(F.lit(1)).cast("bigint").alias("nd2"),
    )
    hist = om.join(lm, "m").agg(
        F.coalesce(
            F.sum(
                F.expr("c * c2 DIV greatest(nd, nd2)")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("est_hist_month")
    )
    est_u = F.expr("n_o * n_l DIV greatest(ndv_o, ndv_l)").cast("bigint")
    return (
        tots.crossJoin(F.broadcast(act))
        .crossJoin(F.broadcast(hist))
        .select(
            "n_o",
            "n_l",
            "ndv_o",
            "ndv_l",
            "actual_rows",
            est_u.alias("est_uniform_ndv"),
            "est_hist_month",
            (
                F.greatest(est_u, F.col("actual_rows")).cast("double")
                / F.least(est_u, F.col("actual_rows"))
            ).alias("qerr_uniform"),
            (
                F.greatest(F.col("est_hist_month"), F.col("actual_rows")).cast(
                    "double"
                )
                / F.least(F.col("est_hist_month"), F.col("actual_rows"))
            ).alias("qerr_hist_month"),
        )
    )


@register(
    "layout_range_partition_balance",
    oracle=f"""
WITH samp AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
  ORDER BY md5('rps:' || CAST(l_orderkey AS VARCHAR) || ':'
               || CAST(l_linenumber AS VARCHAR)),
           l_orderkey, l_linenumber
  LIMIT {SAMPLE_CAP}
),
tiles AS (
  SELECT l_orderkey,
         ntile({RANGE_PARTS}) OVER (ORDER BY l_orderkey, l_linenumber) AS t
  FROM samp
),
bounds AS (
  SELECT CAST(MAX(l_orderkey) AS BIGINT) AS b FROM tiles
  WHERE t < {RANGE_PARTS} GROUP BY t
),
blist AS (SELECT list(b ORDER BY b) AS bl FROM bounds),
assigned AS (
  SELECT CAST(len(list_filter(bl.bl, x -> li.l_orderkey > x)) AS BIGINT)
           AS partition_id,
         li.l_orderkey
  FROM lineitem li CROSS JOIN blist bl
),
parts AS (
  SELECT partition_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
         CAST(MAX(l_orderkey) AS BIGINT) AS max_key
  FROM assigned GROUP BY partition_id
)
SELECT partition_id, n_rows, min_key, max_key,
       CAST(n_rows * {RANGE_PARTS} AS DOUBLE)
         / SUM(n_rows) OVER () AS load_x_avg
FROM parts
""",
)
def layout_range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-driven range partitioning, made auditable — exactly what
    Spark's ``repartitionByRange`` / ``RangePartitioner`` does with its
    reservoir sample, but with a deterministic md5-gate sample so the
    boundary choice (and its imbalance cost) can be *measured* instead
    of trusted: take the SAMPLE_CAP rows of lineitem with the smallest
    row-md5 (a count-bounded deterministic sample — the ntile sort input
    is O(parts x per-part sample) regardless of table size, matching
    RangePartitioner's sampleSizePerPartition semantics; a fixed
    FRACTION would grow the single-partition sort linearly with the
    table), cut it into
    {RANGE_PARTS} ntiles on (l_orderkey, l_linenumber), take each
    tile's max key as a boundary, then assign the FULL table by binary-
    search semantics (partition = #boundaries < key, here expressed as
    size(filter(boundaries, b -> key > b)) over a broadcast boundary
    array — no row blow-up, no extra shuffle).

    ``load_x_avg`` (n_rows x P / total) is the balance verdict: 1.0 is
    perfect; a partition at 2.0 would straggle at 2x. Duplicate keys
    must land in one partition (range partitioning cannot split a key),
    so heavy keys surface here as load > 1 — the audit a 100 TB sort or
    write-with-sorted-layout should run before committing to a boundary
    set. The boundary table is {RANGE_PARTS}-1 rows: broadcast-scale by
    construction, same doctrine as the IVF codebook.
    """
    ensure_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    h = F.md5(
        F.concat(
            F.lit("rps:"),
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )
    # hash-ordered top-N: Spark executes sort+limit as TakeOrdered
    # (per-partition partial top-N, then a bounded merge) — never a
    # global sort of the gated fraction
    samp = (
        li.select("l_orderkey", "l_linenumber", h.alias("h"))
        .orderBy("h", "l_orderkey", "l_linenumber")
        .limit(SAMPLE_CAP)
        .drop("h")
    )
    tiles = samp.select(
        "l_orderkey",
        F.ntile(RANGE_PARTS)
        .over(Window.orderBy("l_orderkey", "l_linenumber"))
        .alias("t"),
    )
    bounds = (
        tiles.filter(F.col("t") < RANGE_PARTS)
        .groupBy("t")
        .agg(F.max("l_orderkey").cast("bigint").alias("b"))
    )
    blist = bounds.agg(
        F.array_sort(F.collect_list("b")).alias("bl")
    )
    assigned = li.crossJoin(F.broadcast(blist)).select(
        F.size(
            F.filter("bl", lambda x: F.col("l_orderkey") > x)
        )
        .cast("bigint")
        .alias("partition_id"),
        "l_orderkey",
    )
    parts = assigned.groupBy("partition_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("l_orderkey").cast("bigint").alias("min_key"),
        F.max("l_orderkey").cast("bigint").alias("max_key"),
    )
    return parts.select(
        "partition_id",
        "n_rows",
        "min_key",
        "max_key",
        (
            (F.col("n_rows") * RANGE_PARTS).cast("double")
            / F.sum("n_rows").over(Window.partitionBy())
        ).alias("load_x_avg"),
    )


@register(
    "stream_watermark_lateness_audit",
    oracle=f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS t,
         epoch_us(ts)
           + CAST(CONCAT('0x', substr(md5('wmj:' ||
                 CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {JITTER_MOD_US} AS arr
  FROM events
),
lagged AS (
  SELECT t,
         MAX(t) OVER (ORDER BY arr, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS runmax_prev
  FROM ev
),
lags AS (
  SELECT GREATEST(COALESCE(runmax_prev, -1) - t, 0) AS lag_us FROM lagged
)
SELECT d.delay_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE lag_us > d.delay_s * 1000000) AS BIGINT)
         AS n_dropped,
       CAST(COUNT(*) FILTER (WHERE lag_us > d.delay_s * 1000000) AS DOUBLE)
         / COUNT(*) AS drop_rate,
       CAST(MAX(lag_us) // 1000000 AS BIGINT) AS max_lag_s
FROM lags, (VALUES {", ".join(f"({d})" for d in WM_DELAYS_S)}) d(delay_s)
GROUP BY d.delay_s
""",
)
def stream_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay selection from measured arrival skew — the audit
    that turns ``withWatermark("ts", ???)`` from a guess into a number.
    events.parquet is stored in event-time order, so out-of-order
    arrival is modeled with a deterministic md5 "network delay" of
    0..10 min per event (both engines derive the identical jitter);
    arrival order is (arrival_us, event_id). An event would be dropped
    by a watermark of delay D iff max(event-time seen before it in
    arrival order) − its event-time > D — exactly Spark Structured
    Streaming's late-data rule. One pass computes that lag; the output
    grid scores candidate delays {WM_DELAYS_S} by events dropped.

    The running max is NOT a single-partition window at scale: arrival
    time is blocked into 1-hour ranges (block = arrival DIV 1h, monotone
    in arrival order), the scan is within-block running max (parallel
    across blocks) combined with a prefix max over the tiny per-block
    summary (#blocks rows, broadcast back) — the classic two-pass
    distributed prefix-scan, the same shape a 100 TB arrival-log audit
    needs. The DuckDB oracle uses the plain global window; the
    block-decomposed Spark plan must (and does) agree exactly.
    """
    ensure_session_conf(spark)
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        t_us.alias("t"),
        (
            t_us
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("wmj:"), F.col("event_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % JITTER_MOD_US
        ).alias("arr"),
    )
    ev = ev.withColumn("blk", F.expr(f"arr DIV {BLOCK_US}"))
    w_in = (
        Window.partitionBy("blk")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = ev.withColumn("in_prev", F.max("t").over(w_in))
    blk_sum = ev.groupBy("blk").agg(F.max("t").alias("blk_max"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_prefix = blk_sum.select(
        "blk", F.max("blk_max").over(w_blk).alias("pre_prev")
    )
    lags = (
        within.join(F.broadcast(blk_prefix), "blk")
        .select(
            F.greatest(
                F.greatest(
                    F.coalesce(F.col("in_prev"), F.lit(-1)),
                    F.coalesce(F.col("pre_prev"), F.lit(-1)),
                )
                - F.col("t"),
                F.lit(0),
            ).alias("lag_us")
        )
    )
    delays = spark.createDataFrame(
        [(d,) for d in WM_DELAYS_S], "delay_s int"
    )
    return (
        lags.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                (F.col("lag_us") > F.col("delay_s") * 1_000_000).cast("long")
            )
            .cast("bigint")
            .alias("n_dropped"),
            (
                F.sum(
                    (F.col("lag_us") > F.col("delay_s") * 1_000_000).cast(
                        "long"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("drop_rate"),
            F.expr("max(lag_us) DIV 1000000").cast("bigint").alias("max_lag_s"),
        )
    )


# --- r8e: small-file compaction planner -------------------------------------

COMPACT_TARGET = 262_144  # target bytes per compacted file (256 KiB at
# fixture scale; production uses 128 MiB — the knob scales, the plan
# arithmetic does not change)
FILE_BUCKETS = 32  # simulated small-file inventory: md5 bucket of doc_id


@register(
    "layout_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT source,
         CAST(CONCAT('0x', substr(md5('file:' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {FILE_BUCKETS}
           AS file_id,
         SUM(n_chars) AS bytes
  FROM documents
  GROUP BY 1, 2
),
planned AS (
  SELECT source, file_id, bytes,
         COALESCE(SUM(bytes) OVER (PARTITION BY source ORDER BY file_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)
           // {COMPACT_TARGET} AS bin
  FROM files
)
SELECT source, CAST(bin AS BIGINT) AS bin,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(file_id) AS BIGINT) AS first_file,
       CAST(MAX(file_id) AS BIGINT) AS last_file,
       CAST(SUM(bytes) AS DOUBLE) / {COMPACT_TARGET} AS fill_ratio
FROM planned
GROUP BY source, bin
""",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: the maintenance pass every table
    format (Delta OPTIMIZE / Iceberg rewrite_data_files) schedules.
    The simulated inventory — md5-bucketed per-source byte totals, a
    many-small-files layout — is packed into merge groups by streaming
    concatenation: files sort by id within source, and a file joins bin
    ``exclusive_prefix_bytes // target``. Every bin except a source's
    last lands in [target, target + max_file), so each merge group is
    one well-sized output file; the report prices the plan (files per
    bin, bytes, fill ratio) before any data moves.

    Deterministic: byte counts are integer sums; bin assignment is one
    integer floor-division of an exact running sum.

    Scale shape: planning touches file-level METADATA only (one row per
    file — at 100 TB with 128 MiB targets that is ~1M rows), so the
    whole planner is a per-source window over a metadata table: no data
    I/O until the plan executes. The prefix-sum window parallelizes per
    source; executing a bin is then a partition-local concat-rewrite
    keyed by (source, bin) — embarrassingly parallel, no shuffle of file
    contents between bins.
    """
    ensure_session_conf(spark)
    d = load_table(spark, sf_dir, "documents")
    file_id = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("file:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % FILE_BUCKETS
    )
    files = d.groupBy("source", file_id.alias("file_id")).agg(
        F.sum("n_chars").alias("bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # exact integer division on the BIGINT prefix sum (DIV, not
    # floor(double /): the double route diverges from the oracle's `//`
    # once cumulative bytes exceed 2^53 — r8 advice)
    planned = files.withColumn(
        "prefix",
        F.coalesce(F.sum("bytes").over(w), F.lit(0)).cast("bigint"),
    ).withColumn("bin", F.expr(f"prefix DIV {COMPACT_TARGET}"))
    return planned.groupBy("source", F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("file_id").cast("bigint").alias("first_file"),
        F.max("file_id").cast("bigint").alias("last_file"),
        (F.sum("bytes").cast("double") / F.lit(COMPACT_TARGET)).alias(
            "fill_ratio"
        ),
    )


# --- r8h: sort-key advisor (equi-depth zone maps, skip-fraction workload) ----

N_ZONES = 32  # equi-depth zones per candidate layout
_ZONE_PROBS = [i / N_ZONES for i in range(1, N_ZONES)]  # i/2^5: exact doubles
_SORT_KEYS = ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
# fixed reference workload: (name, column, lo, hi) — finite sentinels for
# one-sided ranges keep every compare a plain double <=/>=
_WORKLOAD = (
    ("okey_band", "l_orderkey", 1000.0, 2000.0),
    ("partkey_lt", "l_partkey", -1.0e18, 500.0),
    ("qty_ge", "l_quantity", 45.0, 1.0e18),
    ("price_band", "l_extendedprice", 20000.0, 30000.0),
)


def _advisor_sql() -> str:
    """Advisor oracle: discrete equi-depth boundaries by INTEGER rank
    (order statistic at rank ceil(i*n/N_ZONES), located on the per-key
    cumulative counts of DISTINCT values), then the same exploded
    (key, zone) min/max grid as the Spark plan. All rank arithmetic is
    exact integers — no quantile interpolation floats to keep in parity."""
    pred_cols = sorted({w[1] for w in _WORKLOAD})
    kv = "\nUNION ALL ".join(
        f"SELECT '{k}' AS k, CAST({k} AS DOUBLE) AS v FROM lineitem"
        for k in _SORT_KEYS
    )
    case_v = (
        "CASE b.k "
        + " ".join(
            f"WHEN '{k}' THEN CAST(l.{k} AS DOUBLE)"
            for k in _SORT_KEYS[:-1]
        )
        + f" ELSE CAST(l.{_SORT_KEYS[-1]} AS DOUBLE) END"
    )
    mnmx = ",\n".join(
        f"         MIN(c_{c}) AS mn_{c}, MAX(c_{c}) AS mx_{c}"
        for c in pred_cols
    )
    preds = "\nUNION ALL\n".join(
        f"SELECT sort_key, '{name}' AS predicate, n_zones,\n"
        f"       sk_{name} AS n_skipped FROM agg"
        for name, *_ in _WORKLOAD
    )
    sks = ",\n".join(
        f"         CAST(SUM(CASE WHEN mx_{col} < {lo!r} OR mn_{col} > {hi!r}\n"
        f"                  THEN 1 ELSE 0 END) AS BIGINT) AS sk_{name}"
        for name, col, lo, hi in _WORKLOAD
    )
    return f"""
WITH kv AS (
  {kv}
),
vc AS (SELECT k, v, COUNT(*) AS c FROM kv GROUP BY k, v),
cum AS (SELECT k, v, c, SUM(c) OVER (PARTITION BY k ORDER BY v) AS cum
        FROM vc),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
ranks AS (SELECT kk.k, g.i, (g.i * nn.n + {N_ZONES - 1}) // {N_ZONES} AS r
          FROM (SELECT unnest([{", ".join(f"'{k}'" for k in _SORT_KEYS)}])
                  AS k) kk
          CROSS JOIN nn
          CROSS JOIN (SELECT unnest(range(1, {N_ZONES})) AS i) g),
bnd AS (SELECT r.k, r.i, c2.v AS b
        FROM ranks r JOIN cum c2
          ON c2.k = r.k AND c2.cum - c2.c < r.r AND r.r <= c2.cum),
barr AS (SELECT k, list(b ORDER BY i) AS bounds FROM bnd GROUP BY k),
zrows AS (
  SELECT b.k AS sort_key,
         len(list_filter(b.bounds, x -> x <= {case_v})) AS zone,
{",".join(f"         CAST(l.{c} AS DOUBLE) AS c_{c}" for c in pred_cols)}
  FROM lineitem l CROSS JOIN barr b
),
zoned AS (
  SELECT sort_key, zone,
{mnmx}
  FROM zrows GROUP BY sort_key, zone
),
agg AS (
  SELECT sort_key, CAST(COUNT(*) AS BIGINT) AS n_zones,
{sks}
  FROM zoned GROUP BY sort_key
)
SELECT sort_key, predicate, n_zones, n_skipped,
       CAST(n_skipped AS DOUBLE) / CAST(n_zones AS DOUBLE) AS skip_frac
FROM (
{preds}
) t
"""


@register("layout_sort_key_advisor", oracle=_advisor_sql())
def layout_sort_key_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-key advisor: for each candidate sort column, rewrite the
    table (hypothetically) into equi-depth zones and measure how many
    zones each reference predicate could SKIP from zone min/max alone —
    the number a Delta/Iceberg OPTIMIZE-BY decision actually needs.
    `layout_zone_map_skipping` audits the layout you HAVE; this ranks
    the layouts you COULD have, over a declared workload.

    Zones are equi-depth by DISCRETE boundaries at integer rank
    ceil(i*n/N_ZONES) — order statistics located on the per-key
    cumulative counts of DISTINCT values, all-integer rank math in both
    engines (no quantile-interpolation floats to keep in parity, and no
    holistic percentile aggregate: exact percentile buffers the whole
    value multiset through one reducer, the piece that cannot run at
    100 TB and was ~70% of this query's wall at sf0.1).
    zone(x) = |{boundaries <= x}| via one higher-order filter on the
    broadcast bounds arrays — no global row_number, no single-partition
    window over data-grain rows (the per-key cumulative window runs over
    distinct VALUES only). The WHOLE advisor is two table passes: the
    exploded (key, value) boundary build, then one exploded (key, zone)
    pass whose partial min/max agg collapses map-side (the shuffle is
    the |keys|x|zones| grid, not |keys|x the table), fully parallel at
    any scale. A skipped zone is mx < lo OR mn > hi — min/max compares
    on IEEE doubles, identical in both engines; the only emitted float
    is one integer-ratio division.

    At 100 TB the advisor runs on the file-footer statistics table
    instead of raw rows (same shape: zone = file), and candidate keys
    come from predicate-frequency telemetry.
    """
    ensure_session_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pred_cols = sorted({w[1] for w in _WORKLOAD})
    # TWO table passes total (r8 verdict directive #3 — the old shape
    # re-scanned per (key, predicate): 32 scans / 48 exchanges):
    #  pass 1: explode to (key, value), groupBy-count the distinct
    #          values (distributed), per-key cumulative window over the
    #          DISTINCT values only, broadcast rank-interval join at
    #          integer rank ceil(i*n/N_ZONES);
    #  pass 2: each row explodes to |keys| (key, zone) structs against
    #          the broadcast boundary map, and one (key, zone) hash agg
    #          takes the min/max of every predicate column — partial
    #          agg collapses the explode map-side, so the shuffle is
    #          the 4x32-row zone grid, not 4x the table.
    kv = spread(li).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.col(k).cast("double").alias("v"),
                    )
                    for k in _SORT_KEYS
                ]
            )
        ).alias("kv")
    ).select("kv.k", "kv.v")
    vc = kv.groupBy("k", "v").agg(F.count(F.lit(1)).alias("c"))
    # Distributed cumulative count (r13 optimization round): the old
    # per-key window (partitionBy(k).orderBy(v)) funneled each key's
    # whole distinct-value set through ONE reducer — 583k rows for
    # l_extendedprice at sf0.1, and unboundedly more at 100 TB, i.e. a
    # single-reducer-per-key scale defect, not just a slow stage. Two-
    # pass prefix sum instead: range-partition by (k, v), cumsum within
    # each partition, then add the per-(key, partition) offsets (a tiny
    # broadcast). The cum value per (k, v) is the same global prefix sum
    # regardless of where range boundaries land, so results are
    # partition-invariant.
    n_part = spark.sparkContext.defaultParallelism
    vcp = vc.repartitionByRange(n_part, "k", "v").withColumn(
        "pid", F.spark_partition_id()
    ).localCheckpoint()  # pin pid: it must not be recomputed per branch
    woff = (
        Window.partitionBy("k")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        vcp.groupBy("k", "pid")
        .agg(F.sum("c").alias("pt"))
        .select(
            "k",
            "pid",
            F.coalesce(F.sum("pt").over(woff), F.lit(0)).alias("off"),
        )
    )
    wlocal = Window.partitionBy("k", "pid").orderBy("v")
    cum = (
        vcp.join(F.broadcast(off), ["k", "pid"])
        .select(
            "k",
            "v",
            "c",
            (F.sum("c").over(wlocal) + F.col("off")).alias("cum"),
        )
    )
    # per-key total = |lineitem| for every key (one value per row per
    # key): a parquet count-star, NOT an agg over vc — deriving n from
    # vc would put vc on two plan branches and rescan/regroup the whole
    # exploded table a second time (diamond-DAG recompute).
    ncnt = li.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        ncnt.select(
            F.explode(
                F.array(*[F.lit(k) for k in _SORT_KEYS])
            ).alias("k"),
            "n",
        )
        .select(
            "k",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, N_ZONES)])
            ).alias("i"),
            "n",
        )
        .select(
            "k", "i",
            F.expr(f"(i * n + {N_ZONES - 1}) DIV {N_ZONES}").alias("r"),
        )
    )
    bnd = cum.alias("c2").join(
        F.broadcast(ranks.alias("r")),
        (F.col("c2.k") == F.col("r.k"))
        & (F.col("c2.cum") - F.col("c2.c") < F.col("r.r"))
        & (F.col("r.r") <= F.col("c2.cum")),
    ).select(F.col("c2.k").alias("k"), F.col("c2.v").alias("b"))
    # boundaries are nondecreasing in rank, so sort-by-value == order-by-i
    bm = (
        bnd.groupBy("k")
        .agg(F.sort_array(F.collect_list("b")).alias("bounds"))
        .groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("k", "bounds"))
            ).alias("bm")
        )
    )

    def _key_zone(key: str) -> F.Column:
        kd = F.col(key).cast("double")
        return F.struct(
            F.lit(key).alias("sort_key"),
            F.size(
                F.filter(F.col("bm").getItem(key), lambda x: x <= kd)
            ).alias("zone"),
        )

    kz = F.explode(F.array(*[_key_zone(k) for k in _SORT_KEYS]))
    zoned = (
        spread(li).crossJoin(F.broadcast(bm))
        .select(
            kz.alias("kz"),
            *[F.col(c).cast("double").alias(c) for c in pred_cols],
        )
        .select(
            F.col("kz.sort_key").alias("sort_key"),
            F.col("kz.zone").alias("zone"),
            *pred_cols,
        )
        .groupBy("sort_key", "zone")
        .agg(
            *[
                f
                for c in pred_cols
                for f in (
                    F.min(c).alias(f"mn_{c}"),
                    F.max(c).alias(f"mx_{c}"),
                )
            ]
        )
    )
    # One aggregate per key computes every workload predicate's skip
    # count; stack() pivots the wide row to long form.
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_zones")]
    for name, col, lo, hi in _WORKLOAD:
        skipped = F.when(
            (F.col(f"mx_{col}") < F.lit(lo))
            | (F.col(f"mn_{col}") > F.lit(hi)),
            1,
        ).otherwise(0)
        aggs.append(F.sum(skipped).cast("bigint").alias(f"sk_{name}"))
    pairs = ", ".join(f"'{name}', sk_{name}" for name, *_ in _WORKLOAD)
    out = (
        zoned.groupBy("sort_key")
        .agg(*aggs)
        .selectExpr(
            "sort_key",
            f"stack({len(_WORKLOAD)}, {pairs}) AS (predicate, n_skipped)",
            "n_zones",
        )
    )
    return out.select(
        "sort_key",
        "predicate",
        "n_zones",
        "n_skipped",
        (
            F.col("n_skipped").cast("double") / F.col("n_zones").cast("double")
        ).alias("skip_frac"),
    )


# --- r9: partition-grain pruning simulator (complements zone maps) ----------

_PART_GRAINS = ("month", "quarter", "year")
# workload: half-open o_orderdate ranges [lo, hi)
_PRUNE_WORKLOAD = (
    ("one_month", "1996-03-01 00:00:00", "1996-04-01 00:00:00"),
    ("one_quarter", "1997-07-01 00:00:00", "1997-10-01 00:00:00"),
    ("one_year", "1998-01-01 00:00:00", "1999-01-01 00:00:00"),
    ("recent_tail", "2001-01-01 00:00:00", "2101-01-01 00:00:00"),
)


def _prune_sql() -> str:
    grains = ", ".join(f"'{g}'" for g in _PART_GRAINS)
    case = (
        "CASE g.grain "
        + " ".join(
            f"WHEN '{g}' THEN date_trunc('{g}', o_orderdate)"
            for g in _PART_GRAINS[:-1]
        )
        + f" ELSE date_trunc('{_PART_GRAINS[-1]}', o_orderdate) END"
    )
    touched = ",\n".join(
        f"         CAST(SUM(CASE WHEN mx >= TIMESTAMP '{lo}'"
        f" AND mn < TIMESTAMP '{hi}'\n"
        f"                  THEN 1 ELSE 0 END) AS BIGINT) AS t_{name}"
        for name, lo, hi in _PRUNE_WORKLOAD
    )
    preds = "\nUNION ALL\n".join(
        f"SELECT grain, '{name}' AS predicate, n_parts,"
        f" t_{name} AS n_touched, skew_max_over_avg FROM agg"
        for name, *_ in _PRUNE_WORKLOAD
    )
    return f"""
WITH pr AS (
  SELECT g.grain, {case} AS part, o_orderdate
  FROM orders CROSS JOIN (SELECT unnest([{grains}]) AS grain) g
),
parts AS (
  SELECT grain, part, COUNT(*) AS n_rows,
         MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
  FROM pr GROUP BY grain, part
),
agg AS (
  SELECT grain,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
{touched},
         MAX(n_rows) * COUNT(*) * 1.0 / SUM(n_rows) AS skew_max_over_avg
  FROM parts GROUP BY grain
)
SELECT grain, predicate, n_parts, n_touched,
       (n_parts - n_touched) * 1.0 / n_parts AS prune_frac,
       skew_max_over_avg
FROM (
{preds}
) t
"""


@register("layout_partition_pruning_sim", oracle=_prune_sql())
def layout_partition_pruning_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-grain pruning simulator: for each candidate partition
    grain of orders (month / quarter / year of o_orderdate), measure
    against a declared range workload (a) how many partitions each query
    would touch using real per-partition min/max stats — the
    partition-pruning twin of layout_zone_map_skipping's zone grain —
    and (b) the partition-size skew (max/avg rows) that grain induces.
    Finer grains prune more but multiply file/partition count and
    planning cost; this emits the exact table that trade-off is decided
    from (the Delta/Iceberg `PARTITIONED BY` decision, and the Spark
    `spark.sql.sources.partitionOverwriteMode` sizing input).

    Plan shape: ONE scan — each row explodes to |grains| (grain, part)
    pairs, one hash agg to partition grain (~120 rows at any SF: the
    grid is bounded by the date span, not the table), then the workload
    compares run on the tiny grain table. Touch rule for [lo, hi):
    mx >= lo AND mn < hi — real stats, so an empty month prunes itself.

    Determinism: counts are BIGINT; the two emitted ratios are single
    integer-ratio divisions; timestamp compares are exact instants
    (session tz pinned UTC).
    """
    ensure_session_conf(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderdate")
    kz = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("grain"),
                    F.date_trunc(g, "o_orderdate").alias("part"),
                )
                for g in _PART_GRAINS
            ]
        )
    )
    parts = (
        spread(o)
        .select(kz.alias("kz"), "o_orderdate")
        .select("kz.grain", "kz.part", "o_orderdate")
        .groupBy("grain", "part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderdate").alias("mn"),
            F.max("o_orderdate").alias("mx"),
        )
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (
            F.max("n_rows") * F.count(F.lit(1)) / F.sum("n_rows")
        ).alias("skew_max_over_avg"),
    ]
    for name, lo, hi in _PRUNE_WORKLOAD:
        t = F.when(
            (F.col("mx") >= F.lit(lo).cast("timestamp"))
            & (F.col("mn") < F.lit(hi).cast("timestamp")),
            1,
        ).otherwise(0)
        aggs.append(F.sum(t).cast("bigint").alias(f"t_{name}"))
    pairs = ", ".join(f"'{n}', t_{n}" for n, *_ in _PRUNE_WORKLOAD)
    return (
        parts.groupBy("grain")
        .agg(*aggs)
        .selectExpr(
            "grain",
            f"stack({len(_PRUNE_WORKLOAD)}, {pairs}) AS (predicate, n_touched)",
            "n_parts",
            "skew_max_over_avg",
        )
        .select(
            "grain",
            "predicate",
            "n_parts",
            "n_touched",
            (
                (F.col("n_parts") - F.col("n_touched"))
                / F.col("n_parts")
            ).alias("prune_frac"),
            "skew_max_over_avg",
        )
    )


# --- r10: column clustering factor under a physical sort order --------------

# Probe columns measured under the time-ingested layout (l_shipdate,
# l_orderkey, l_linenumber) — the order a CDC-fed fact table lands in.
CF_COLUMNS = ("l_returnflag", "l_partkey", "l_orderkey")


def _sql_cf_block(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) FILTER (WHERE chg) AS BIGINT) AS n_runs,
       CAST(COUNT(*) AS DOUBLE)
         / COUNT(*) FILTER (WHERE chg) AS avg_run_len,
       CAST(COUNT(*) FILTER (WHERE chg) AS DOUBLE)
         / COUNT(DISTINCT {col}) AS runs_per_distinct
FROM (
  SELECT {col},
         {col} IS DISTINCT FROM LAG({col}) OVER w AS chg
  FROM lineitem
  WINDOW w AS (ORDER BY l_shipdate, l_orderkey, l_linenumber)
) t
WHERE chg IS NOT NULL OR true
"""


@register(
    "layout_clustering_factor",
    oracle=" UNION ALL ".join(_sql_cf_block(c) for c in CF_COLUMNS),
)
def layout_clustering_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column CLUSTERING FACTOR under the time-ingested physical layout
    (rows ordered by l_shipdate, l_orderkey, l_linenumber — how a
    CDC-fed fact table lands on disk): per probe column, the number of
    value RUNS, the average run length, and runs-per-distinct-value —
    1.0 means perfectly clustered (every distinct value is one
    contiguous stripe, so zone maps / min-max pruning skip everything
    irrelevant), n_rows/n_distinct means fully scattered (zone maps are
    useless for that column). This is the Oracle-style clustering
    factor generalized to columnar layouts — the measured input that
    layout_sort_key_advisor and layout_zone_map_skipping reason FROM:
    the advisor picks the sort key, this query quantifies what the
    current layout actually delivers for each filter column.

    Deterministic: run boundaries are integer LAG comparisons under a
    total order; the two ratios are single divisions of exact counts.

    Scale shape (r14 optimization round — guide §2, single-reducer
    removal): runs are counted PER RANGE PARTITION (local sort + local
    LAG, fully parallel) and the partition boundaries are stitched with
    one tiny pass — each partition contributes its (first, last) row
    (min/max of a struct led by the unique sort triple), and the exact
    correction ``local_head_chg − global_head_chg`` is summed over the
    n_partitions boundary rows. The result is integer-identical to the
    old single global LAG window for any null pattern, but no stage
    ever funnels row-grain data through one reducer — the decomposition
    the zone-map query documents, now actually implemented (the prior
    form shuffled ALL of lineitem to one partition for the sort:
    `Exchange SinglePartition` + 600 k-row single-threaded Sort at
    sf0.1, unbounded at 100 TB).
    """
    ensure_session_conf(spark)
    sort_cols = ("l_shipdate", "l_orderkey", "l_linenumber")
    li = load_table(spark, sf_dir, "lineitem").select(
        *sort_cols, *CF_COLUMNS
    )
    n_part = spark.sparkContext.defaultParallelism
    # pid pinned by localCheckpoint: the flags pass and the boundary
    # pass must agree on the partitioning (same doctrine as
    # layout_sort_key_advisor's prefix sum).
    rp = (
        li.repartitionByRange(n_part, *sort_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wloc = Window.partitionBy("pid").orderBy(*sort_cols)
    flags = rp.select(
        *[F.col(c) for c in CF_COLUMNS],
        *[
            (~F.col(c).eqNullSafe(F.lag(c).over(wloc))).alias(f"chg_{c}")
            for c in CF_COLUMNS
        ],
    )
    # per-partition first/last rows: the sort triple is unique, so the
    # min/max of a struct led by it is exactly the partition's head/tail
    # (fields renamed: l_orderkey is both a sort and a probe column).
    edge = F.struct(
        *[F.col(c).alias(f"s_{i}") for i, c in enumerate(sort_cols)],
        *[F.col(c).alias(f"c_{c}") for c in CF_COLUMNS],
    )
    bnd = rp.groupBy("pid").agg(
        F.min(edge).alias("first"), F.max(edge).alias("last")
    )
    wpid = Window.orderBy("pid")
    # overcount per boundary & column = local_head_chg − global_head_chg:
    #   local  = first.c IS NOT NULL          (head LAG is null locally)
    #   global = NOT eqNullSafe(first.c, prev_last.c)
    adj = bnd.select(
        "pid",
        F.lag("last").over(wpid).alias("prev_last"),
        "first",
    ).filter(F.col("prev_last").isNotNull())
    corr = adj.agg(
        *[
            F.coalesce(
                F.sum(
                    F.col(f"first.c_{c}").isNotNull().cast("long")
                    - (
                        ~F.col(f"first.c_{c}").eqNullSafe(
                            F.col(f"prev_last.c_{c}")
                        )
                    ).cast("long")
                ),
                F.lit(0),
            ).alias(f"corr_{c}")
            for c in CF_COLUMNS
        ]
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.countDistinct(c).cast("bigint").alias(f"nd_{c}")
            for c in CF_COLUMNS
        ],
        *[
            F.sum(F.when(F.col(f"chg_{c}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"raw_nr_{c}")
            for c in CF_COLUMNS
        ],
    ).crossJoin(F.broadcast(corr)).select(
        "n_rows",
        *[F.col(f"nd_{c}") for c in CF_COLUMNS],
        *[
            (F.col(f"raw_nr_{c}") - F.col(f"corr_{c}"))
            .cast("bigint")
            .alias(f"nr_{c}")
            for c in CF_COLUMNS
        ],
    )
    stacked = ", ".join(f"'{c}', nd_{c}, nr_{c}" for c in CF_COLUMNS)
    return (
        agg.selectExpr(
            "n_rows",
            f"stack({len(CF_COLUMNS)}, {stacked})"
            " AS (column_name, n_distinct, n_runs)",
        )
        .select(
            "column_name",
            "n_rows",
            "n_distinct",
            "n_runs",
            (F.col("n_rows").cast("double") / F.col("n_runs")).alias(
                "avg_run_len"
            ),
            (F.col("n_runs").cast("double") / F.col("n_distinct")).alias(
                "runs_per_distinct"
            ),
        )
    )
