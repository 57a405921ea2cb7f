"""Query registry: the single source of truth for the driver contract.

Every implemented operator registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, where ANSI-SQL-expressible, a DuckDB
oracle SQL string computing the same result over the same parquet tables.
``__spark_entry__.queries()`` / ``oracle_sql()`` read from here.

Determinism rules every registered query follows (the driver hash-compares
values against DuckDB):

1. **Float sums/avgs go through decimals.**  Double addition is
   non-associative, so parallel engines disagree in the last ulp.  We cast
   operands to ``DECIMAL(p, s)`` before SUM (exact, order-independent) and
   cast the final result back to DOUBLE.  A finite double can never be an
   exact rounding tie at a decimal scale (ties need a factor of 5^s in the
   denominator; doubles are p/2^q), so Spark's HALF_UP and DuckDB's
   round-to-nearest agree on every input.
2. **Every ORDER BY / window ORDER BY carries a unique tiebreaker.**
3. **Aggregate/computed columns are aliased identically in both dialects**
   (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules whose import registers queries (order = SURVEY §2 walk order).
_OPERATOR_MODULES = (
    "hbase_observer_elasticsearch_spark.operators.cdc",
    "hbase_observer_elasticsearch_spark.operators.relational",
    "hbase_observer_elasticsearch_spark.operators.tpch_more",
    "hbase_observer_elasticsearch_spark.operators.reshape",
    "hbase_observer_elasticsearch_spark.operators.skew_agg",
    "hbase_observer_elasticsearch_spark.operators.windows",
    "hbase_observer_elasticsearch_spark.operators.scalar_fns",
    "hbase_observer_elasticsearch_spark.operators.dedup",
    "hbase_observer_elasticsearch_spark.operators.similarity",
    "hbase_observer_elasticsearch_spark.operators.text",
    "hbase_observer_elasticsearch_spark.operators.time_windows",
    "hbase_observer_elasticsearch_spark.operators.udf_surface",
    "hbase_observer_elasticsearch_spark.operators.multimodal",
    "hbase_observer_elasticsearch_spark.operators.stream_queries",
    "hbase_observer_elasticsearch_spark.operators.sampling",
    "hbase_observer_elasticsearch_spark.operators.profiling",
    "hbase_observer_elasticsearch_spark.operators.sketches",
    "hbase_observer_elasticsearch_spark.operators.quality",
    "hbase_observer_elasticsearch_spark.operators.io_surface",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


# Explicit walk order for the driver contract. The driver's correctness
# harness checks a bounded prefix of the registry (r1 recorded exactly the
# first 50 entries), so the prefix carries the surface that most needs an
# official green row each round: the LLM-pipeline operators (dedup /
# similarity / text / UDF / multimodal / time-window / window / scalar
# batteries), then this round's new-or-changed queries, then the flagship
# CDC set. The long-stable TPC-H/relational tail follows (green in
# CORRECTNESS_r01.json). Names not yet registered are skipped; registered
# names not listed append in module-import order.
_PRIORITY = (
    # --- r5 window (the driver checks a ~50-entry prefix) ---
    # r4 verdict directive #2: 75 registry queries had never received an
    # OFFICIAL driver correctness row (union of the r1-r4 50-query windows
    # = 140 of 215 names). This window leads with the two queries whose
    # code changed this round, then 48 of the never-checked 75 picked for
    # category spread; the remaining 26 never-checked follow immediately
    # so r6's rotation finishes the job. Everything else (green in
    # CORRECTNESS_r01-r04 + CORRECTNESS_FULL_r04) appends in module order.
    "cdc_python_datasource_stream",  # changed: partition-parallel reader
    "orders_open_backlog",  # changed: same-day delta fix (r4 advice)
    # new in r5 (no official row nor FULL row yet)
    "stream_left_outer_join",
    "stream_full_outer_join",
    "stream_chained_stateful",
    "corpus_eval_ngram_overlap",
    "corpus_unigram_familiarity",
    "similarity_range_search_rhp",
    "join_asof_tolerance",
    "join_asof_forward",
    "dedup_minhash_containment",
    "source_orc_roundtrip",
    "udf_arrow_scalar",
    "window_session_dynamic_gap",
    # never-checked: streaming proofs
    "stream_tumbling_agg",
    "stream_session_agg",
    "stream_dedup_within_watermark",
    # never-checked: ANN index families + recall audits
    "similarity_topk_rhp",
    "similarity_recall_rhp",
    "similarity_topk_pq",
    "similarity_recall_pq",
    "similarity_pair_dot_stats",
    # never-checked: graph analytics
    "graph_pagerank",
    "graph_triangle_count",
    "graph_degree_distribution",
    # never-checked: CDC history / lifecycle / connector batch face
    "cdc_scd2_history",
    "cdc_time_travel",
    "cdc_snapshot_diff",
    "cdc_retention_purge",
    "cdc_python_datasource",
    # never-checked: dedup meta-analysis + corpus analytics
    "dedup_lsh_pr_curve",
    "dedup_url_host",
    "dedup_cluster_embedding_quality",
    "docs_minhash_band_stats",
    "corpus_dedup_savings",
    "corpus_gate_report",
    "corpus_source_overlap",
    # never-checked: text analysis battery
    "text_tfidf_cosine_pairs",
    "text_dup_ngram_coverage",
    "text_chunking",
    "text_token_histogram",
    "text_repetition_quality",
    "text_blocklist_gate",
    "text_boilerplate_chunks",
    "text_prefix_dup_groups",
    # never-checked: multimodal
    "multimodal_phash_dedup",
    "multimodal_payload_stats",
    # never-checked: sketches
    "sketch_battery",
    "sketch_countmin",
    "agg_sketch_quantiles",
    "agg_approx_topk",
    # never-checked: event/business analytics
    "events_funnel",
    "events_retention_cohort",
    "events_attribution_last_touch",
    "events_dau_mau_stickiness",
    "time_asof_interpolate",
    # never-checked: join flavors
    "join_asof_nearest",
    "join_interval_overlap",
    "join_salted_skew",
    "join_bucketed_colocated",
    # never-checked: data quality
    "quality_fk_orphans",
    "quality_row_rules",
    # --- spill: the remaining 26 never-checked (r6 window leads here) ---
    "events_ewma_trailing",
    "events_gap_fill_locf",
    "events_value_trend",
    "events_zscore_outliers",
    "events_hourly_seasonality",
    "events_interarrival_stats",
    "events_rolling_actives",
    "events_top_paths",
    "orders_ship_latency_monthly",
    "window_time_range_trailing",
    "window_trailing_median",
    "basket_brand_lift",
    "customer_rfm_segments",
    "agg_conditional_battery",
    "agg_incremental_rollup",
    "bitwise_funcs",
    "null_handling_funcs",
    "variant_funcs",
    "recursive_markov_paths",
    "subquery_exists_battery",
    "sample_topk_per_group",
    "sample_weighted_bernoulli",
    "pack_length_buckets",
    "profile_column_histogram",
    "profile_file_layout",
    "profile_key_skew",
)


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
