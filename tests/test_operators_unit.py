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


def test_pair_fanout_caps_hot_buckets(spark):
    """A bucket wider than the cap is dropped from pair generation (and
    counted via the Observation metric); buckets at/below the cap fan out
    every in-bucket pair."""
    from pyspark.sql import Observation

    from hbase_observer_elasticsearch_spark.operators.dedup import (
        _pairs_from_groups,
    )

    grouped = spark.createDataFrame(
        [
            ("cool", [1, 2, 3]),
            ("hot", list(range(100, 100 + 10))),  # > cap=4 → dropped
        ],
        "s string, ids array<long>",
    )
    obs = Observation("cap")
    pairs = _pairs_from_groups(grouped, cap=4, observation=obs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert obs.get["n_dropped_buckets"] == 1
    assert obs.get["n_buckets"] == 2


def test_edit_distance_band_blocking_matches_all_pairs(spark):
    """Length-band blocking finds exactly the pairs the naive all-pairs
    join finds — including pairs whose lengths straddle a band boundary."""
    import itertools

    names = ["abcd", "abcde", "abc", "abcdefg", "zzzz", "abqd", "ab"]
    dist_le3 = {
        tuple(sorted(p))
        for p in itertools.combinations(names, 2)
        if _lev(p[0], p[1]) <= 3
    }
    d = spark.createDataFrame([(n,) for n in names], "p_name string")
    from pyspark.sql import functions as F  # noqa: F811

    from hbase_observer_elasticsearch_spark.operators.text import _LEN_BAND

    band = F.floor(F.length("p_name") / _LEN_BAND).cast("int")
    a = d.select(
        F.col("p_name").alias("name_a"),
        F.explode(F.array(band - 1, band, band + 1)).alias("blk"),
    )
    b = d.select(F.col("p_name").alias("name_b"), band.alias("blk"))
    got = {
        (r["name_a"], r["name_b"])
        for r in a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b", 3))
        .filter(F.col("dist") >= 0)
        .collect()
    }
    assert got == dist_le3


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
