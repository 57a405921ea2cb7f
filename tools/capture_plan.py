"""Capture .explain("formatted") of registered queries to text files.

Usage: python tools/capture_plan.py OUT_DIR SUFFIX name [name ...]
Writes OUT_DIR/<name>_<SUFFIX>.txt for each query. Runs from whatever
repo checkout is first on sys.path (so a `git worktree` of an older
commit captures the *before* plan into the live repo's plans dir).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_elasticsearch_spark.registry import queries  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plan")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
