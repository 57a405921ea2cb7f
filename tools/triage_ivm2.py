"""Dump per-micro-batch progress metrics for the IVM drain to find the
fixed per-batch cost (triggerExecution breakdown), and A/B the drain at
different shuffle-partition counts."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_observer_elasticsearch_spark.operators.skew_agg import (  # noqa: E402
    IVM_EPOCHS,
    _ivm_change_stream,
)
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402
from hbase_observer_elasticsearch_spark.sources.changefeed import (  # noqa: E402
    scratch_dir,
    write_changefeed_stream_dir,
)
from hbase_observer_elasticsearch_spark.streaming.stateful import (  # noqa: E402
    stateful_ivm_deltas,
)


def drain(spark, feed_dir, base, parts):
    name = "ivm_probe_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.perf_counter()
        q = (
            stateful_ivm_deltas(spark, feed_dir, max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(base, "ckpt_" + name))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        wall = round(time.perf_counter() - t0, 3)
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.catalog.dropTempView(name)
    return wall, prog


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("triage_ivm2")
    base = scratch_dir("triage_ivm2_")
    feed_dir = os.path.join(base, "feed")
    write_changefeed_stream_dir(
        _ivm_change_stream(spark, sf_dir), feed_dir, n_files=IVM_EPOCHS
    )
    # warm
    drain(spark, feed_dir, base, 4)
    wall4, prog = drain(spark, feed_dir, base, 4)
    print("wall parts=4:", wall4)
    for p in prog:
        print(
            "batch",
            p["batchId"],
            "rows",
            p["numInputRows"],
            json.dumps(p["durationMs"]),
        )
    for parts in (1, 2, 8, 32):
        w, _ = drain(spark, feed_dir, base, parts)
        print(f"wall parts={parts}:", w)
    wall4b, _ = drain(spark, feed_dir, base, 4)
    print("wall parts=4 again:", wall4b)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
