"""PySpark-native analytics engine with the capabilities of
chenzhenguo/hbase-observer-elasticsearch, rebuilt Spark-first.

The reference (/root/reference) is an HBase RegionObserver coprocessor that
mirrors row mutations into Elasticsearch as micro-batched document
upserts/deletes (see SURVEY.md).  This package re-expresses that CDC
pipeline — plus the full analytics / LLM-data-pipeline surface mandated by
BASELINE.json — as idiomatic PySpark:

- ``session``    SparkSession factory (AQE on, UTC, arrow enabled)
- ``catalog``    fixture loading / temp-view registration
- ``operators``  relational + CDC + dedup/similarity/text operators
- ``sources``    changefeed synthesis and scans
- ``sinks``      idempotent upsert "ES bulk" emulation (parquet state dir)
- ``streaming``  Structured Streaming restatement of the reference pipeline
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
- ``registry``   the (queries, oracle_sql) pairs consumed by __spark_entry__
"""

__version__ = "0.1.0"
