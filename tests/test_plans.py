"""Plan-shape assertions: the properties that matter at 100 TB.

Filters reach the parquet scan, projections prune columns, dim joins
broadcast, shingle candidate generation is an equi-join (never cartesian),
and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

from hbase_observer_elasticsearch_spark import plans
from hbase_observer_elasticsearch_spark.registry import queries

QS = queries()


def test_filter_pushdown_and_pruning(spark, sf_dir):
    df = QS["proj_filter_cast"](spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_quantity" in pushed and "l_returnflag" in pushed
    cols = plans.scan_read_columns(df)[0]
    assert "l_comment" not in cols
    assert "l_partkey" not in cols  # projection pruned to used columns


def test_star_join_broadcasts(spark, sf_dir):
    df = QS["q5_region_revenue"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_lsh_candidates_not_cartesian(spark, sf_dir):
    df = QS["dedup_minhash_lsh"](spark, sf_dir)
    assert not plans.has_cartesian_or_bnl(df)


def test_agg_in_codegen(spark, sf_dir):
    df = QS["q1_pricing_summary"](spark, sf_dir)
    assert len(plans.wholestage_codegen_ids(df, execute=True)) >= 1
    # vectorized parquet read feeding the codegen'd agg
    assert "Batched: true" in plans.explain_str(df)


def test_topn_uses_take_ordered(spark, sf_dir):
    df = QS["sort_limit_topn"](spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.explain_str(df)
