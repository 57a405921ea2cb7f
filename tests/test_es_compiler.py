"""ES _search compiler tests: JSON query DSL → Catalyst plan.

Each test compiles a request and checks it against an independently
hand-built DataFrame (or explicit expectations), including the ES
null-semantics corner (must_not over a NULL field keeps the doc) that
Spark's three-valued logic would get wrong without null-collapsing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.catalog import load_table
from hbase_observer_elasticsearch_spark.plans.es_compiler import (
    _wildcard_regex,
    compile_query,
    compile_search,
)

SF = "/root/testdata/sf0.001"


def docs(spark):
    return load_table(spark, SF, "documents")


def test_match_all_and_term_keyword(spark):
    d = docs(spark)
    assert d.filter(compile_query({"match_all": {}})).count() == d.count()
    got = d.filter(compile_query({"term": {"lang": "en"}})).count()
    want = d.filter(F.col("lang") == "en").count()
    assert got == want > 0


def test_term_on_analyzed_text_is_token_membership(spark):
    d = docs(spark)
    got = d.filter(compile_query({"term": {"text": "spark"}})).count()
    want = d.filter(
        F.array_contains(F.split("text", " "), "spark")
    ).count()
    assert got == want > 0
    # and NOT substring semantics: a term that is only ever a prefix of
    # longer tokens must not match
    assert d.filter(compile_query({"term": {"text": "spar"}})).count() == 0


def test_range_and_ids(spark):
    d = docs(spark)
    q = {"range": {"n_chars": {"gte": 100, "lt": 300}}}
    got = d.filter(compile_query(q)).count()
    want = d.filter(
        (F.col("n_chars") >= 100) & (F.col("n_chars") < 300)
    ).count()
    assert got == want > 0
    assert d.filter(compile_query({"ids": {"values": [1, 2, 3]}})).count() == 3


def test_wildcard_translation():
    assert _wildcard_regex("src*1") == "^src.*1$"
    assert _wildcard_regex("s?c") == "^s.c$"
    assert _wildcard_regex("a.b") == "^a\\.b$"


def test_wildcard_and_prefix_on_keyword(spark):
    d = docs(spark)
    got = d.filter(compile_query({"wildcard": {"source": "src*"}})).count()
    assert got == d.count()
    p = d.filter(compile_query({"prefix": {"source": "src1"}})).count()
    want = d.filter(F.col("source").startswith("src1")).count()
    assert p == want > 0


def test_match_operator_and_vs_or(spark):
    d = docs(spark)
    a = d.filter(
        compile_query(
            {"match": {"text": {"query": "table scan", "operator": "and"}}}
        )
    ).count()
    o = d.filter(
        compile_query(
            {"match": {"text": {"query": "table scan", "operator": "or"}}}
        )
    ).count()
    both = d.filter(
        F.array_contains(F.split("text", " "), "table")
        & F.array_contains(F.split("text", " "), "scan")
    ).count()
    either = d.filter(
        F.array_contains(F.split("text", " "), "table")
        | F.array_contains(F.split("text", " "), "scan")
    ).count()
    assert (a, o) == (both, either) and a <= o


def test_minimum_should_match_counts(spark):
    d = docs(spark)
    shoulds = [
        {"term": {"text": "merge"}},
        {"term": {"text": "batch"}},
        {"term": {"text": "spark"}},
    ]
    got = d.filter(
        compile_query(
            {"bool": {"should": shoulds, "minimum_should_match": 2}}
        )
    ).count()
    cnt = sum(
        F.array_contains(F.split("text", " "), t).cast("int")
        for t in ("merge", "batch", "spark")
    )
    want = d.filter(cnt >= 2).count()
    assert got == want > 0


def test_must_not_keeps_null_field_docs(spark):
    # ES semantics: must_not term on a NULL field keeps the doc
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], ["doc_id", "tag"]
    )
    kept = df.filter(
        compile_query({"bool": {"must_not": [{"term": {"tag": "a"}}]}})
    )
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]


def test_exists_clause(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["doc_id", "tag"]
    )
    got = df.filter(compile_query({"exists": {"field": "tag"}})).collect()
    assert [r.doc_id for r in got] == [1]


def test_nested_bool_composes(spark):
    d = docs(spark)
    q = {
        "bool": {
            "filter": [
                {"terms": {"lang": ["en", "de"]}},
                {
                    "bool": {
                        "should": [
                            {"range": {"n_chars": {"lt": 150}}},
                            {"range": {"n_chars": {"gte": 1000}}},
                        ]
                    }
                },
            ]
        }
    }
    got = d.filter(compile_query(q)).count()
    want = d.filter(
        F.col("lang").isin("en", "de")
        & ((F.col("n_chars") < 150) | (F.col("n_chars") >= 1000))
    ).count()
    assert got == want > 0


def test_aggs_match_direct_groupby(spark):
    d = docs(spark)
    req = {
        "query": {"match_all": {}},
        "aggs": {
            "by_lang": {
                "terms": {"field": "lang", "size": 100},
                "aggs": {"chars_sum": {"sum": {"field": "n_chars"}}},
            }
        },
    }
    got = {
        r["key"]: (r["doc_count"], r["chars_sum"])
        for r in compile_search(d, req).collect()
    }
    want = {
        r["lang"]: (r["c"], r["s"])
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("c"), F.sum("n_chars").alias("s")
        )
        .collect()
    }
    assert got == want


def test_hits_page_contract(spark):
    d = docs(spark)
    req = {"query": {"term": {"lang": "en"}}, "size": 5}
    out = compile_search(d, req).collect()
    n_en = d.filter(F.col("lang") == "en").count()
    assert len(out) == min(5, n_en)
    assert all(r["total_hits"] == n_en for r in out)
    ids = [r["doc_id"] for r in out]
    assert ids == sorted(ids)
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))


def test_compiled_filters_push_to_scan(spark):
    # the numeric/keyword conjuncts of a compiled bool must reach the
    # parquet scan (null-collapsing is confined to must_not / msm
    # counting — a coalesce-wrapped conjunct would push nothing)
    from hbase_observer_elasticsearch_spark.plans import pushed_filters

    d = docs(spark)
    q = {
        "bool": {
            "filter": [
                {"range": {"n_chars": {"gte": 100}}},
                {"terms": {"lang": ["en", "de"]}},
                {"term": {"text": "spark"}},
            ]
        }
    }
    pushed = " ".join(pushed_filters(d.filter(compile_query(q))))
    assert "GreaterThanOrEqual(n_chars,100)" in pushed
    assert "In(lang" in pushed


def test_unsupported_kinds_raise(spark):
    with pytest.raises(ValueError):
        compile_query({"fuzzy": {"text": "spark"}})
    with pytest.raises(ValueError):
        compile_query({"range": {"n_chars": {}}})
    d = docs(spark)
    with pytest.raises(ValueError):
        compile_search(
            d,
            {
                "aggs": {
                    "x": {"date_histogram": {"field": "n_chars"}}
                }
            },
        )
