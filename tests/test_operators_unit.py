"""Unit tests on tiny literal DataFrames: shingling, hashing portability,
latest_by_key, vector math."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.functions import hashing as H
from hbase_observer_elasticsearch_spark.functions.vectors import cosine
from hbase_observer_elasticsearch_spark.operators.cdc import latest_by_key
from hbase_observer_elasticsearch_spark.operators.dedup import shingle_docs


def test_shingles_short_docs(spark):
    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["s"]) for r in shingle_docs(d, w=3).collect()
    }
    assert got == {(1, "a b c"), (1, "b c d")}  # <w words → no shingles


def test_shingles_dedup_within_doc(spark):
    d = spark.createDataFrame([(1, "a b a b a b a b")], "doc_id long, text string")
    got = [r["s"] for r in shingle_docs(d, w=3).collect()]
    assert sorted(got) == ["a b a", "b a b"]  # distinct


def test_token_code_matches_duckdb(spark):
    import duckdb

    words = ["hello", "spark", "the", "café ☕"]
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    s_codes = {
        r["w"]: r["c"]
        for r in sdf.select("w", H.token_code(F.col("w")).alias("c")).collect()
    }
    con = duckdb.connect()
    for w in words:
        (d_code,) = con.execute(
            "SELECT CAST(CONCAT('0x', substr(md5(?), 1, 8)) AS BIGINT)", [w]
        ).fetchone()
        assert s_codes[w] == d_code, w


def test_latest_by_key(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, ts long, v string"
    )
    got = {
        (r["k"], r["v"])
        for r in latest_by_key(df, ["k"], [F.col("ts")]).collect()
    }
    assert got == {(1, "b"), (2, "c")}


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([2.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == 0.0
    assert abs(got[1] - 1.0) < 1e-12
    assert got[2] == 1.0
