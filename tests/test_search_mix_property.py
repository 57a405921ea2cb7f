"""Property-based tests (hypothesis) for the late-r6 retrieval and
mixing operators: random corpora vs independent python references."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import hbase_observer_elasticsearch_spark.memos as memos
import hbase_observer_elasticsearch_spark.operators.text as tx
from hbase_observer_elasticsearch_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    corpus_mix_temperature,
    search_bm25_topk,
)

VOCAB = list(BM25_TERMS) + ["alpha", "beta", "gamma", "delta"]


def _docs_df(spark, texts_by_source):
    rows = []
    i = 0
    for src, texts in texts_by_source.items():
        for t in texts:
            rows.append((i, t, "en", src, len(t)))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _patched(spark, df, fn):
    orig = tx.load_table
    tx.load_table = lambda s, d, n: df
    # the memos are keyed by (app, sf_dir) and cannot see that the
    # patched "synthetic" table changed between hypothesis examples —
    # drop ALL of them (postings AND every derived memo) on both sides
    # of the call via the central registry, so no derived cache (e.g.
    # dl/corpus stats) outlives the corpus it was computed from.
    memos.clear_memos()
    try:
        return fn(spark, "synthetic").collect()
    finally:
        tx.load_table = orig
        memos.clear_memos()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=2000), min_size=2, max_size=6
    )
)
def test_temperature_mix_property(spark, sizes):
    """Exact-budget fill, near-monotonicity, and agreement (±1 token,
    the borderline-fraction tolerance) with an independent python
    largest-remainder implementation, over random source sizes."""
    texts = {
        f"s{i}": [" ".join(["alpha"] * n)] for i, n in enumerate(sizes)
    }
    rows = _patched(
        spark, _docs_df(spark, texts), corpus_mix_temperature
    )
    got = {r.source: r.allocated_tokens for r in rows}
    n_tok = {r.source: r.n_tokens for r in rows}
    budget = sum(n_tok.values()) // 2
    assert sum(got.values()) == budget

    tot_w = sum(math.sqrt(float(v)) for v in n_tok.values())
    share = {s: budget * math.sqrt(float(v)) / tot_w for s, v in n_tok.items()}
    base = {s: math.floor(v) for s, v in share.items()}
    rem = budget - sum(base.values())
    order = sorted(n_tok, key=lambda s: (-(share[s] - base[s]), s))
    bonus = set(order[:rem])
    for s in n_tok:
        assert abs(got[s] - (base[s] + (1 if s in bonus else 0))) <= 1
    # weak monotonicity: a strictly larger source never trails a
    # smaller one by more than the single largest-remainder token
    bysize = sorted(n_tok, key=lambda s: (n_tok[s], s))
    for a, b in zip(bysize, bysize[1:]):
        if n_tok[b] > n_tok[a]:
            assert got[b] >= got[a] - 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(VOCAB), min_size=1, max_size=30
        ).map(" ".join),
        min_size=3,
        max_size=12,
    )
)
def test_bm25_matches_python_reference(spark, texts):
    """Full-ranking agreement with an independent python BM25 on random
    corpora. The engine casts each per-term score to DECIMAL(28,6)
    before summing (the order-free determinism contract), so the
    reference quantizes each term score the same way; ranking is then
    exact on (quantized score desc, doc_id)."""
    from decimal import ROUND_HALF_UP, Decimal

    df = _docs_df(spark, {"s": texts})
    hits = _patched(spark, df, search_bm25_topk)

    def q6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    docs = {i: t.split(" ") for i, t in enumerate(texts)}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {
        w: sum(1 for t in docs.values() if w in t) for w in BM25_TERMS
    }
    scores = {}
    for did, toks in docs.items():
        s = Decimal(0)
        matched = 0
        for w in BM25_TERMS:
            tf = toks.count(w)
            if tf == 0:
                continue
            matched += 1
            idf = (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5)
            tfn = (tf * (BM25_K1 + 1.0)) / (
                tf
                + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(toks) / avgdl))
            )
            s += q6(idf * tfn)
        if matched:
            scores[did] = (s, matched)
    expect = sorted(scores, key=lambda d: (-scores[d][0], d))[:10]
    assert [h.doc_id for h in hits] == expect
    for h in hits:
        s, matched = scores[h.doc_id]
        assert h.n_terms == matched
        assert q6(h.bm25) == s
