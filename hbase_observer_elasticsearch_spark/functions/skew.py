"""Skew mitigation: salted two-stage aggregation.

Spark already handles the common skew cases — partial+final aggregation
(map-side combine) makes skewed SUM/COUNT groups cheap, and AQE splits
skewed sort-merge join partitions (`spark.sql.adaptive.skewJoin.*`). The
remaining gap is aggregations whose partial state is *large* (collect_list,
count-distinct over high-cardinality values, percentile buffers): one hot
key then funnels its entire state through one reducer.

`salted` + `two_stage` splits such a key across `n_salt` reducers: stage 1
aggregates by (key, salt), stage 2 merges the n_salt partials per key. The
stage-2 shuffle carries one row per (key, salt) — bounded, skew-free.

Works only for algebraic aggregates (a merge function exists). Used by the
`agg_salted_heavy_hitters` query as the oracle-checked demonstration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALT_DEFAULT = 16


def salted(df: DataFrame, n_salt: int = N_SALT_DEFAULT) -> DataFrame:
    """Attach a deterministic salt in [0, n_salt) — derived from a hash of
    the whole row (monotonically_increasing_id would break retry
    determinism; rand() would break replay)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salt))
    )


def two_stage(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salt: int = N_SALT_DEFAULT,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    partial_aggs run per (keys..., salt); final_aggs merge the partials per
    keys. Callers name partial outputs and reference them in final_aggs,
    e.g. partial ``F.count(F.lit(1)).alias("c")`` + final
    ``F.sum("c").alias("n")``.
    """
    stage1 = salted(df, n_salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)
