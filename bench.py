"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is materialized with the noop sink (full execution, no
output-format cost). The headline metric is total wall-seconds across the
registered query set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_observer_elasticsearch_spark.registry import queries  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = queries()
    # JVM/file-cache warmup on the flagship query (not timed)
    materialize(qs["cdc_last_state"](spark, sf_dir))

    per_query: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
