"""Round-8h operator invariants: PMI arithmetic on a planted corpus,
Flesch banding on hand-computable docs, and nDCG discount math against
monkeypatched ranked lists."""

from __future__ import annotations

import math

import hbase_observer_elasticsearch_spark.operators.similarity as sm
import hbase_observer_elasticsearch_spark.operators.text as tx
from hbase_observer_elasticsearch_spark.operators.similarity import (
    IDCG_AT_K,
    N_QUERIES,
    TOPK,
    search_quality_ndcg,
)
from hbase_observer_elasticsearch_spark.operators.text import (
    corpus_bigram_pmi,
    text_readability_score,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_idcg_constant_matches_definition():
    assert IDCG_AT_K == sum(1.0 / math.log2(i + 1) for i in range(1, TOPK + 1))


def test_pmi_exact_on_planted_corpus(spark, monkeypatch):
    # "x y" x5: tokens = 10 (c_x = c_y = 5), bigram slots = 9,
    # c_(x,y) = 5, c_(y,x) = 4 (below support floor 5 -> dropped).
    docs = spark.createDataFrame(
        [(1, "x y x y x y x y x y", "en", "s1", 19)], DOC_SCHEMA
    )
    monkeypatch.setattr(tx, "load_table", lambda s, sf, n: docs)
    rows = corpus_bigram_pmi(spark, "r8h").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w1, r.w2, r.c_ab, r.c_w1, r.c_w2) == ("x", "y", 5, 5, 5)
    expected = (5.0 / 9.0) / ((5.0 / 10.0) * (5.0 / 10.0))
    import decimal

    q = decimal.Decimal(math.log(expected)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
    )
    assert r.pmi == float(q)


def test_readability_band_hand_computed(spark, monkeypatch):
    # "Hello world." -> 2 words, 1 sentence, 3 vowel groups:
    # 206.835 - 1.015*2 - 84.6*1.5 = 77.905 -> band 7
    docs = spark.createDataFrame(
        [(1, "Hello world.", "en", "s1", 12)], DOC_SCHEMA
    )
    monkeypatch.setattr(tx, "load_table", lambda s, sf, n: docs)
    rows = text_readability_score(spark, "r8h").collect()
    assert len(rows) == 1
    assert (rows[0].source, rows[0].band, rows[0].n_docs) == ("s1", 7, 1)


def test_ndcg_discount_math(spark, monkeypatch):
    # one relevant pair (q0, n1); system 'rhp' places it at rank 1 ->
    # dcg = 1/log2(2) = 1.0; other systems miss -> dcg 0, mean_ndcg 0.
    bf = spark.createDataFrame(
        [(0, 1)], "query_id long, neighbor_id long"
    )
    hit = spark.createDataFrame(
        [(0, 1, 1), (0, 9, 2)], "query_id long, neighbor_id long, rk long"
    )
    miss = spark.createDataFrame(
        [(0, 8, 1)], "query_id long, neighbor_id long, rk long"
    )
    monkeypatch.setattr(sm, "_bruteforce_topk", lambda s, sf: bf)
    monkeypatch.setattr(sm, "similarity_topk_rhp", lambda s, sf: hit)
    monkeypatch.setattr(sm, "similarity_topk_pq", lambda s, sf: miss)
    monkeypatch.setattr(sm, "similarity_topk_ivfpq", lambda s, sf: miss)
    monkeypatch.setattr(sm, "similarity_rank_fusion_rrf", lambda s, sf: miss)
    rows = {r.system: r for r in search_quality_ndcg(spark, "r8h").collect()}
    assert rows["rhp"].n_hits == 1
    assert rows["rhp"].dcg_total == 1.0
    assert abs(
        rows["rhp"].mean_ndcg - 1.0 / (IDCG_AT_K * N_QUERIES)
    ) < 1e-12
    for sysname in ("pq", "ivfpq", "rrf"):
        assert rows[sysname].n_hits == 0
        assert rows[sysname].mean_ndcg == 0.0
