"""dedup_minhash_bbit final-stage variants, interleaved best-of-3:
A = registered (checkpoint, 16-col sig joins)
B = no checkpoint
C = checkpoint + packed 16-bit sig (bit_count(a XOR b) agreement)
D = checkpoint + broadcast-hinted sig joins
E = packed + broadcast
Also prints sig rowcount and the join strategies picked for A."""

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


def build(spark, sf_dir, variant):
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
    packed = variant in ("C", "E")
    bcast = variant in ("D", "E")
    ck = variant != "B"
    if packed:
        bits = None
        for k in range(H.MINHASH_K):
            t = (F.min(H.affine(F.col("code"), k)) % 2).cast("long") * F.lit(
                1 << k
            ).cast("long")
            bits = t if bits is None else bits + t
        sig = coded.groupBy("doc_id").agg(bits.alias("packed"))
        if ck:
            sig = sig.localCheckpoint()
        siga = sig.select(
            F.col("doc_id").alias("doc_a"), F.col("packed").alias("pa")
        )
        sigb = sig.select(
            F.col("doc_id").alias("doc_b"), F.col("packed").alias("pb")
        )
        if bcast:
            siga, sigb = F.broadcast(siga), F.broadcast(sigb)
        n_agree = F.lit(H.MINHASH_K) - F.bit_count(
            F.col("pa").bitwiseXOR(F.col("pb"))
        )
        f = (
            pj.join(siga, "doc_a")
            .join(sigb, "doc_b")
            .select(
                F.least(
                    F.lit(9).cast("bigint"), F.floor(F.col("j") * 10)
                ).alias("j_decile"),
                "j",
                (
                    (2 * n_agree - H.MINHASH_K).cast("double")
                    / F.lit(float(H.MINHASH_K))
                ).alias("est"),
            )
        )
    else:
        sig = coded.groupBy("doc_id").agg(
            *[
                (F.min(H.affine(F.col("code"), k)) % 2).alias(f"b{k}")
                for k in range(H.MINHASH_K)
            ]
        )
        if ck:
            sig = sig.localCheckpoint()
        siga = sig.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"b{k}").alias(f"a{k}") for k in range(H.MINHASH_K)],
        )
        sigb = sig.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f"b{k}").alias(f"bb{k}") for k in range(H.MINHASH_K)],
        )
        if bcast:
            siga, sigb = F.broadcast(siga), F.broadcast(sigb)
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
    spark = get_spark("triage_bbit3")
    jvm_system = spark._jvm.System  # noqa: SLF001
    dd._shingles_memo(spark, sf_dir)
    dd._verified_pairs_memo(spark, sf_dir)
    variants = ["A", "B", "C", "D", "E"]
    for v in variants:
        noop(build(spark, sf_dir, v))  # warm
    res = {v: [] for v in variants}
    for _ in range(3):
        for v in variants:
            jvm_system.gc()
            t0 = time.perf_counter()
            noop(build(spark, sf_dir, v))
            res[v].append(round(time.perf_counter() - t0, 3))
    out = {v: {"draws": d, "best": min(d)} for v, d in res.items()}
    # correctness spot: A vs C row-identical?
    a = {
        tuple(r)
        for r in build(spark, sf_dir, "A").collect()
    }
    c = {
        tuple(r)
        for r in build(spark, sf_dir, "E").collect()
    }
    out["rows_equal_A_vs_E"] = a == c
    plan = build(spark, sf_dir, "A")._jdf.queryExecution().executedPlan().toString()
    out["A_joins"] = [
        ln.strip()[:90]
        for ln in plan.splitlines()
        if "Join" in ln or "Exchange" in ln
    ][:12]
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
