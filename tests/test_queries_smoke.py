"""Smoke: every registered query runs at sf0.001 with a stable schema and
every oracle parses in DuckDB. (Exact value parity vs DuckDB is covered by
tools/check.py at sf0.01 — too slow for the unit suite.)"""

from __future__ import annotations

import duckdb
import pytest

from hbase_observer_elasticsearch_spark.catalog import TABLES
from hbase_observer_elasticsearch_spark.registry import oracle_sql, queries

QS = queries()
ORACLES = oracle_sql()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_runs(spark, sf_dir, name):
    df = QS[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_every_oracle_parses_and_oracle_coverage(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in ORACLES.items():
        con.sql(sql)  # raises on parse/bind errors
    # every oracle key is a registered query
    assert set(ORACLES) <= set(QS)
    # every query has an oracle (r3: even the Lloyd trainer is unrolled)
    assert set(QS) == set(ORACLES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_type", "n_users", "sum_value", "avg_value"}
