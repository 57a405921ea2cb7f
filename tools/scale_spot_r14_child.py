"""Child runner for the r14 scale spot bench: one (sf_dir, cpus) pair
per process (local[N] is fixed per JVM). Prints ONE JSON line:
{"sf_dir":..., "cpus":..., "rows": {name: best_sec, ...}}.

Protocol (matches tools/scale100_spot.py): memo builds timed COLD as
their own rows (the build is the measurement), registered queries timed
warm best-of-2 with a System.gc settle, noop sink.

Usage: SPARK_GRAFT_CPUS=N python tools/scale_spot_r14_child.py SF_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_elasticsearch_spark.registry import queries  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402

# memo builds first (cold rows), then the r14-rewritten scale-sensitive
# queries (warm best-of-2).
MEMO_BUILDS = (
    "memo_dedup_shingles",
    "memo_dedup_verified_pairs",
    "memo_text_postings",
    "memo_text_dl_stats",
    "memo_rhp_scored",
)
QUERIES = (
    # lineitem-grain (r14 rewrites)
    "layout_clustering_factor",
    "layout_sort_key_advisor",
    # documents-grain
    "corpus_bigram_lm_perplexity",
    "dedup_minhash_bbit",
    "dedup_prefix_filter_join",
    "search_bm25_topk",
    "search_dis_max",
    "sample_poisson_bootstrap_ci",
    "sample_permutation_test",
    # embeddings-grain
    "similarity_topk_rhp",
    "similarity_mutual_knn",
)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("scale_spot_r14")
    jvm_system = spark._jvm.System  # noqa: SLF001
    qs = queries()

    from hbase_observer_elasticsearch_spark.catalog import load_table
    from hbase_observer_elasticsearch_spark.operators import dedup as dd
    from hbase_observer_elasticsearch_spark.operators import (
        similarity as sim,
    )
    from hbase_observer_elasticsearch_spark.operators import text as tx

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the file index + JIT with one scan per touched table
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        noop(load_table(spark, sf_dir, t))

    rows: dict[str, float] = {}
    builds = {
        "memo_dedup_shingles": dd._shingles_memo,
        "memo_dedup_verified_pairs": dd._verified_pairs_memo,
        "memo_text_postings": tx._postings_memo,
        "memo_text_dl_stats": tx._dl_stats_memo,
        "memo_rhp_scored": sim._rhp_scored,
    }
    for name in MEMO_BUILDS:
        jvm_system.gc()
        t0 = time.perf_counter()
        builds[name](spark, sf_dir)
        rows[name] = round(time.perf_counter() - t0, 3)

    for name in QUERIES:
        times = []
        for _ in range(2):
            jvm_system.gc()
            t0 = time.perf_counter()
            noop(qs[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        rows[name] = round(min(times), 3)

    spark.stop()
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
