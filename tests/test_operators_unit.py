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


def test_connected_components_star_beats_propagation_on_path(spark):
    """large-star/small-star must converge in O(log d) rounds on a path
    graph — the worst case for plain one-hop min propagation — and both
    must land the identical fixpoint (every node labeled with the path
    minimum)."""
    from pyspark.sql import functions as F

    from hbase_observer_elasticsearch_spark.operators.dedup import (
        _cc_min_propagation,
        connected_components,
    )

    n = 17  # path 0-1-2-...-16 (diameter 16) + an isolated node 100
    nodes = spark.createDataFrame([(i,) for i in range(n)] + [(100,)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )

    star_labels, star_rounds = connected_components(nodes, edges)
    got = {r["id"]: r["label"] for r in star_labels.collect()}
    assert got == {**{i: 0 for i in range(n)}, 100: 100}

    prop_labels, prop_rounds = _cc_min_propagation(nodes, edges)
    assert {r["id"]: r["label"] for r in prop_labels.collect()} == got

    # diameter 16: propagation needs ~16 one-hop rounds; star contracts
    # chains geometrically
    assert prop_rounds >= 8
    assert star_rounds <= 6
    assert star_rounds < prop_rounds


def test_connected_components_merges_components(spark):
    """Two cliques joined by a bridge edge collapse to one component; edge
    orientation and duplicate/self edges must not matter."""
    from hbase_observer_elasticsearch_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    edges = spark.createDataFrame(
        # clique {1,2,3}, clique {5,6,7}, bridge 3-5; node 8 isolated;
        # messy input: reversed dupes + a self-loop
        [(2, 1), (1, 3), (3, 2), (6, 5), (5, 7), (7, 6), (3, 5), (5, 3), (4, 4)],
        "src long, dst long",
    )
    labels, _ = connected_components(nodes, edges)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1, 7: 1, 4: 4, 8: 8}


import pytest


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_connected_components_vs_union_find(spark, seed):
    """Cross-validate large-star/small-star against a pure-Python
    union-find on random sparse graphs (mixed components, chains, hubs,
    isolates)."""
    import random

    from hbase_observer_elasticsearch_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ] + [(i, i + 1) for i in range(20)]  # guarantee one long chain

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id per component
    comp: dict = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {i: min(comp[find(i)]) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    labels, rounds = connected_components(nodes, e)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == want
    assert rounds <= 10  # O(log d), not O(d)
