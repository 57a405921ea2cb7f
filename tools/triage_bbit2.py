"""Decompose dedup_minhash_bbit's warm cost: which stage carries the
~5 s? Times (noop sink, best-of-3, interleaved): the semi-joined coded
read, the 16-min signature aggregate, the final pair join, and the
r12-form coded (fresh scan, no shingle memo) for comparison."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from hbase_observer_elasticsearch_spark.catalog import load_table  # noqa: E402
from hbase_observer_elasticsearch_spark.operators import dedup as dd  # noqa: E402
from hbase_observer_elasticsearch_spark.operators.dedup import (  # noqa: E402
    H,
    shingle_docs,
)
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def parts(spark, sf_dir):
    vp = dd._verified_pairs_memo(spark, sf_dir)
    pj = vp.select("doc_a", "doc_b", F.col("jaccard").alias("j"))
    pair_docs = (
        pj.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pj.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    coded_memo = dd._coded(spark, sf_dir).join(
        F.broadcast(pair_docs), "doc_id", "semi"
    )
    d = load_table(spark, sf_dir, "documents")
    coded_fresh = (
        shingle_docs(d)
        .select("doc_id", H.token_code(F.col("s")).alias("code"))
        .join(F.broadcast(pair_docs), "doc_id", "semi")
    )

    def sig_of(coded):
        return coded.groupBy("doc_id").agg(
            *[
                (F.min(H.affine(F.col("code"), k)) % 2).alias(f"b{k}")
                for k in range(H.MINHASH_K)
            ]
        )

    return {
        "coded_memo_semi": lambda: coded_memo,
        "coded_fresh_semi": lambda: coded_fresh,
        "sig_from_memo": lambda: sig_of(coded_memo),
        "sig_from_fresh": lambda: sig_of(coded_fresh),
        "memo_plain_read": lambda: dd._coded(spark, sf_dir),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("triage_bbit2")
    jvm_system = spark._jvm.System  # noqa: SLF001
    dd._shingles_memo(spark, sf_dir)
    dd._verified_pairs_memo(spark, sf_dir)
    p = parts(spark, sf_dir)
    for fn in p.values():  # warm
        noop(fn())
    res = {k: [] for k in p}
    for _ in range(3):
        for k, fn in p.items():
            jvm_system.gc()
            t0 = time.perf_counter()
            noop(fn())
            res[k].append(round(time.perf_counter() - t0, 3))
    # row counts / partition counts for context
    ctx = {
        "shingle_rows": dd._coded(spark, sf_dir).count(),
        "shingle_parts": dd._coded(spark, sf_dir).rdd.getNumPartitions(),
        "pair_rows": dd._verified_pairs_memo(spark, sf_dir).count(),
    }
    out = {k: {"draws": v, "best": min(v)} for k, v in res.items()}
    out["ctx"] = ctx
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
