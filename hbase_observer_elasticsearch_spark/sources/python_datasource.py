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

    def simpleStreamReader(self, schema) -> "ChangefeedSimpleStreamReader":
        return ChangefeedSimpleStreamReader(self.options)


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


class ChangefeedSimpleStreamReader:
    """Driver-side streaming reader (Spark 4
    `SimpleDataSourceStreamReader`): offsets are row positions in seq
    order, each micro-batch serves `batchSize` mutations — the streaming
    face of the same connector (a real implementation would tail the
    replication log / WAL and use log sequence numbers as offsets; the
    offset/read/readBetweenOffsets replay contract is identical).

    `readBetweenOffsets` makes the source REPLAYABLE: after a restart,
    Spark re-requests exactly the uncommitted offset range, which is what
    upgrades the pipeline to effectively-exactly-once (the reference's
    requeue-on-failure, ElasticSearchBulkOperator.java:56-66, replays
    blindly and duplicates instead).
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.batch = int(options.get("batchSize", "2500"))
        self._rows = None

    # -- helpers ----------------------------------------------------------
    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                self.path,
                columns=["event_id", "event_type", "user_id", "value"],
            )
            rows = sorted(
                zip(
                    t["event_id"].to_pylist(),
                    t["event_type"].to_pylist(),
                    t["user_id"].to_pylist(),
                    t["value"].to_pylist(),
                )
            )
            self._rows = [
                (
                    eid,
                    "delete" if etype == "error" else "put",
                    str(uid),
                    None if etype == "error" else etype,
                    None if etype == "error" else val,
                )
                for eid, etype, uid, val in rows
            ]
        return self._rows

    # -- SimpleDataSourceStreamReader contract ----------------------------
    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        rows = self._load()
        i0 = start["pos"]
        i1 = min(i0 + self.batch, len(rows))
        return iter(rows[i0:i1]), {"pos": i1}

    def readBetweenOffsets(self, start, end):
        rows = self._load()
        return iter(rows[start["pos"] : end["pos"]])

    def commit(self, end):
        pass  # file-backed demo source: nothing to release
