"""Solo A/B triage of dedup_minhash_bbit (r13 verdict item 2): the r13
round added a localCheckpoint() of the 1-bit signature table and the
driver bench recorded 1.92 -> 5.72 s. Interleaved same-process A/B at
sf0.1: A = registered form (with checkpoint), B = identical body
without the checkpoint (diamond recompute). Memos prebuilt untimed so
both variants measure warm incremental cost, like the bench."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from hbase_observer_elasticsearch_spark.operators import dedup as dd  # noqa: E402
from hbase_observer_elasticsearch_spark.operators.dedup import H  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def body(spark, sf_dir, checkpoint: bool):
    vp = dd._verified_pairs_memo(spark, sf_dir)
    pj = vp.select("doc_a", "doc_b", F.col("jaccard").alias("j"))
    pair_docs = (
        pj.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pj.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    coded = dd._coded(spark, sf_dir).join(
        F.broadcast(pair_docs), "doc_id", "semi"
    )
    sig = coded.groupBy("doc_id").agg(
        *[
            (F.min(H.affine(F.col("code"), k)) % 2).alias(f"b{k}")
            for k in range(H.MINHASH_K)
        ]
    )
    if checkpoint:
        sig = sig.localCheckpoint()
    siga = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(H.MINHASH_K)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(H.MINHASH_K)],
    )
    n_agree = None
    for k in range(H.MINHASH_K):
        term = F.when(F.col(f"a{k}") == F.col(f"bb{k}"), 1).otherwise(0)
        n_agree = term if n_agree is None else n_agree + term
    est = (2 * n_agree - H.MINHASH_K).cast("double") / F.lit(
        float(H.MINHASH_K)
    )
    f = (
        pj.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select(
            F.least(
                F.lit(9).cast("bigint"), F.floor(F.col("j") * 10)
            ).alias("j_decile"),
            "j",
            est.alias("est"),
        )
    )
    dec = lambda c: F.sum(c.cast("decimal(18,12)")).cast("double")  # noqa: E731
    return f.groupBy("j_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (dec(F.col("j")) / F.count(F.lit(1))).alias("mean_jaccard"),
        (dec(F.col("est")) / F.count(F.lit(1))).alias("mean_est_1bit"),
        (dec(F.abs(F.col("est") - F.col("j"))) / F.count(F.lit(1))).alias(
            "mean_abs_err"
        ),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("triage_bbit")
    jvm_system = spark._jvm.System  # noqa: SLF001

    # warm: memo builds untimed, plus one run of each variant for JIT
    dd._shingles_memo(spark, sf_dir)
    dd._verified_pairs_memo(spark, sf_dir)
    noop(body(spark, sf_dir, True))
    noop(body(spark, sf_dir, False))

    res = {"A_checkpoint": [], "B_no_checkpoint": []}
    for _ in range(3):
        for label, ck in (("A_checkpoint", True), ("B_no_checkpoint", False)):
            jvm_system.gc()
            t0 = time.perf_counter()
            noop(body(spark, sf_dir, ck))
            res[label].append(round(time.perf_counter() - t0, 3))
    out = {
        k: {"draws": v, "best": min(v), "median": sorted(v)[1]}
        for k, v in res.items()
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
