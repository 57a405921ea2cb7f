"""Bucketed co-located join: the orders⋈lineitem shuffle disappears."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark import plans
from hbase_observer_elasticsearch_spark.catalog import load_table
from hbase_observer_elasticsearch_spark.sinks.bucketed import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", 8, str(tmp_path / "ob"))
    write_bucketed(li, "lineitem_b", "l_orderkey", 8, str(tmp_path / "lb"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    # force SMJ so the assertion is about bucketing, not broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            spark,
            "lineitem_b",
            "orders_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).select("l_orderkey", "l_quantity", "o_orderpriority")
        plan = plans.explain_str(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets consumed directly
        assert "Bucketed: true" in plan

        # same answer as the plain (shuffling) join
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Aggregation on the bucket key also skips its shuffle."""
    agg = (
        spark.table("lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in plans.explain_str(agg)
