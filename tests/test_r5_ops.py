"""Targeted tests for the r5 operator additions (beyond the registry
smoke + oracle gates): brute-force cross-checks and semantic invariants.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.catalog import load_table
from hbase_observer_elasticsearch_spark.registry import queries

QS = queries()


def test_left_outer_join_subsumes_inner(spark, sf_dir):
    """The streamed LEFT OUTER interval join must contain exactly the
    inner join's matches plus null rows — and a put never appears as
    BOTH matched and null-padded."""
    outer = QS["stream_left_outer_join"](spark, sf_dir)
    inner = QS["stream_put_delete_join"](spark, sf_dir)
    o_matched = outer.filter("del_ts IS NOT NULL")
    assert o_matched.count() == inner.count()
    assert (
        o_matched.select("put_seq", "del_ts")
        .exceptAll(inner.select("put_seq", "del_ts"))
        .count()
        == 0
    )
    null_seqs = outer.filter("del_ts IS NULL").select("put_seq")
    assert null_seqs.intersect(o_matched.select("put_seq")).count() == 0


def test_asof_tolerance_bruteforce(spark, sf_dir):
    """join_asof_tolerance == a per-user python scan with the same
    (ts, event_id) ordering and 30-minute staleness rule."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    expect = {}
    for _uid, grp in ev.groupby("user_id"):
        last_click = None  # (ts, value)
        for r in grp.itertuples(index=False):
            if r.event_type == "purchase":
                val, stale = None, None
                if last_click is not None:
                    delta = r.ts - last_click[0]
                    if delta <= pd.Timedelta(minutes=30):
                        val = last_click[1]
                        stale = delta // pd.Timedelta(microseconds=1)
                expect[r.event_id] = (val, stale)
            if r.event_type == "click":
                last_click = (r.ts, r.value)
    got = {
        r.event_id: (r.last_click_value, r.staleness_us)
        for r in QS["join_asof_tolerance"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for eid in expect:
        assert got[eid] == expect[eid], (eid, got[eid], expect[eid])


def test_eval_ngram_overlap_bounds(spark, sf_dir):
    """Contamination fractions are valid and the eval split is exactly
    the doc_id % 17 == 0 slice (docs long enough to have a shingle)."""
    rows = QS["corpus_eval_ngram_overlap"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.filter(
        ((F.col("doc_id") % 17) == 0)
        & (F.size(F.split("text", " ")) >= 3)
    ).count()
    assert len(rows) == eligible
    for r in rows:
        assert 0 <= r.n_in_train <= r.n_shingles
        assert abs(r.overlap_frac - r.n_in_train / r.n_shingles) < 1e-12
        assert r.contaminated == (2 * r.n_in_train >= r.n_shingles)


def test_unigram_familiarity_invariants(spark, sf_dir):
    """Familiarity >= 1 (every token occurs at least once — itself) and
    hapax_frac in [0, 1]; doc-level extremes bracket the lang mean."""
    for r in QS["corpus_unigram_familiarity"](spark, sf_dir).collect():
        assert r.familiarity >= 1.0
        assert 0.0 <= r.hapax_frac <= 1.0
        assert r.min_doc_familiarity <= r.familiarity <= r.max_doc_familiarity


def test_range_search_agrees_with_topk(spark, sf_dir):
    """Every top-k RHP hit above the radius threshold must be counted by
    the range search (same candidate set, same exact cosine)."""
    from hbase_observer_elasticsearch_spark.operators.similarity import RANGE_T

    topk = QS["similarity_topk_rhp"](spark, sf_dir)
    rng = {
        r.query_id: r.n_in_range
        for r in QS["similarity_range_search_rhp"](spark, sf_dir).collect()
    }
    above = (
        topk.filter(F.col("cos_sim") >= RANGE_T)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in above:
        assert rng.get(r.query_id, 0) >= r.n


def test_full_outer_join_partitions_into_three_classes(spark, sf_dir):
    """matched + put-null + delete-null rows partition the emission; the
    matched class equals the inner join, and no seq appears in two
    classes."""
    fo = QS["stream_full_outer_join"](spark, sf_dir)
    inner = QS["stream_put_delete_join"](spark, sf_dir)
    matched = fo.filter("put_seq IS NOT NULL AND del_seq IS NOT NULL")
    pnull = fo.filter("del_seq IS NULL")
    dnull = fo.filter("put_seq IS NULL")
    assert matched.count() == inner.count()
    assert fo.count() == matched.count() + pnull.count() + dnull.count()
    assert (
        pnull.select("put_seq")
        .intersect(matched.select("put_seq"))
        .count()
        == 0
    )
    assert (
        dnull.select("del_seq")
        .intersect(matched.select("del_seq"))
        .count()
        == 0
    )
    # left-outer's null set is exactly full-outer's put-null set
    lo_null = QS["stream_left_outer_join"](spark, sf_dir).filter(
        "del_ts IS NULL"
    )
    assert lo_null.count() == pnull.count()
