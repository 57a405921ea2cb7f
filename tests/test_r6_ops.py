"""Round-6 operator invariants: waterfill allocation math and
streaming keyed-state dedup uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.operators.stream_queries import (
    stream_exact_dedup_keyed_state,
)
from hbase_observer_elasticsearch_spark.operators.text import (
    corpus_mix_waterfill,
)


def _waterfill_reference(sizes: dict[str, int], budget: int):
    """Independent brute-force waterfill: scan every integer cap level
    implied by the sorted sizes (the closed-form must agree)."""
    n = len(sizes)
    ordered = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    cum = 0
    kk, ss = 0, 0
    for rk, (_, s) in enumerate(ordered, start=1):
        cum += s
        if cum + (n - rk) * s <= budget:
            kk, ss = rk, cum
    if kk >= n:
        return {src: s for src, s in ordered}, None
    cap = (budget - ss) // (n - kk)
    return {src: min(s, cap) for src, s in ordered}, cap


def test_waterfill_matches_bruteforce_on_fixture(spark, sf_dir):
    rows = corpus_mix_waterfill(spark, sf_dir).collect()
    sizes = {r.source: r.n_tokens for r in rows}
    budget = sum(sizes.values()) // 2
    expect, cap = _waterfill_reference(sizes, budget)
    got = {r.source: r.allocated_tokens for r in rows}
    assert got == expect
    # allocation never exceeds the budget, and fills it to within one
    # cap step (integer waterfill's slack bound)
    total = sum(got.values())
    assert total <= budget
    if cap is not None:
        n_capped = sum(1 for r in rows if r.is_capped)
        assert budget - total < max(n_capped, 1)
        assert all(
            (r.n_tokens > cap) == r.is_capped for r in rows
        )


def test_waterfill_partial_cap_branch(spark):
    """Skewed synthetic sources exercise K>0 (some sources taken in
    full, heavy tail capped) — the fixture's near-uniform sources cap
    everything, so this branch needs its own data."""
    import hbase_observer_elasticsearch_spark.operators.text as tx

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * n), "en", src, n)
            for i, (src, n) in enumerate(
                [("tiny", 10), ("small", 40), ("big", 400), ("huge", 1000)]
            )
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # monkey-patch load_table within the operator's module namespace
    orig = tx.load_table
    tx.load_table = lambda spark, sf_dir, name: docs
    try:
        rows = {r.source: r for r in corpus_mix_waterfill(spark, "x").collect()}
    finally:
        tx.load_table = orig
    # budget = 1450 // 2 = 725; tiny+small fit in full (10+40+2*40=130
    # <= 725 ... prefix rule), cap = (725 - 50) // 2 = 337
    assert rows["tiny"].allocated_tokens == 10 and not rows["tiny"].is_capped
    assert rows["small"].allocated_tokens == 40 and not rows["small"].is_capped
    assert rows["big"].allocated_tokens == 337 and rows["big"].is_capped
    assert rows["huge"].allocated_tokens == 337 and rows["huge"].is_capped


def test_stream_dedup_unique_and_min_keeper(spark, sf_dir):
    out = stream_exact_dedup_keyed_state(spark, sf_dir)
    n = out.count()
    assert out.select("canon_hash").distinct().count() == n
    # keeper is the global min doc_id of its hash group (batch restate)
    from hbase_observer_elasticsearch_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.split(F.col("text"), " ")))
        ).alias("canon_hash"),
    )
    expect = docs.groupBy("canon_hash").agg(
        F.min("doc_id").alias("keeper_doc_id")
    )
    assert (
        out.exceptAll(
            expect.select("canon_hash", "keeper_doc_id")
        ).count()
        == 0
    )
    assert expect.count() == n
