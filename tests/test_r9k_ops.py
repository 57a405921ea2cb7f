"""Round-9k: the Murphy identity Brier = REL − RES + UNC + within-bin
variance, asserted on planted scores."""

from __future__ import annotations

import hbase_observer_elasticsearch_spark.operators.quality as ql
from hbase_observer_elasticsearch_spark.operators.quality import (
    quality_brier_decomposition,
)


def test_brier_murphy_identity(spark, monkeypatch):
    rows = []
    for i in range(40):
        lang = "en" if (i * 7) % 3 == 0 else "de"
        score = float((i * 13) % 40) / 40.0
        rows.append((i, "web", lang, 3, score))
    scores = spark.createDataFrame(
        rows,
        "doc_id long, source string, lang string, n_tok long, score double",
    )
    monkeypatch.setattr(ql, "_hash_doc_scores", lambda sp, sf: scores)
    out = quality_brier_decomposition(spark, "r9k").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 40
    assert 0 <= r.brier <= 1
    assert r.reliability >= 0 and r.resolution >= 0 and r.within_bin_var >= 0
    assert (
        abs(
            r.brier
            - (r.reliability - r.resolution + r.uncertainty + r.within_bin_var)
        )
        < 1e-9
    )
