"""SparkSession factory.

Local-mode defaults tuned for the test harness (local[N] single JVM), but
every setting here is what we would also want on a 1000-executor cluster:
AQE for runtime re-planning (skew joins, partition coalescing), UTC session
timezone for deterministic timestamp semantics, Arrow for any
pandas-interchange path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbase-observer-es-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def config_info(spark: SparkSession, prefix: str = "spark.sql") -> dict[str, str]:
    """Structured dump of session config for logs/diagnostics — the Spark
    analog of the reference's reflection-based `ESClient.getInfo()`
    (observer6/ESClient.java:41-53, SURVEY §2.1 #20)."""
    return {
        k: v for k, v in sorted(spark.sparkContext.getConf().getAll())
        if k.startswith(prefix)
    } | {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.session.timeZone",
        )
    }


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-mutable confs we rely on for oracle-exact results.

    The driver may hand us a session it built itself; session timezone and
    AQE are runtime-settable SQLConf, so pin them here.  Called at the top
    of every registered query.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Source-side filter pushdown for Python DataSources (Spark 4.1):
    # off by default upstream; required for the changefeed reader's
    # rowkey-region pruning (sources/python_datasource.py).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark
