"""Property-based changefeed replay: Spark's apply_changefeed equals a
straight-line Python reference on arbitrary mutation sequences, and is
invariant to how the feed is split into micro-batches.

The Python model encodes the reference's semantics directly (SURVEY §2.1):
replay mutations ordered by (ts, family, seq); a put merges its qualifier,
a delete drops the whole doc. Same-ts collisions resolve by family byte
order then seq — matching apply_changefeed's window ordering.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_observer_elasticsearch_spark.operators.cdc import apply_changefeed
from hbase_observer_elasticsearch_spark.sources.changefeed import CHANGEFEED_SCHEMA

ROWKEYS = ["r1", "r2"]
FAMILIES = ["a", "b"]
QUALS = ["c1", "c2"]
VALUES = ["v1", "v2"]
T0 = dt.datetime(2024, 1, 1)


@st.composite
def mutations(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for seq in range(n):
        op = draw(st.sampled_from(["put", "put", "put", "delete"]))
        rowkey = draw(st.sampled_from(ROWKEYS))
        ts = T0 + dt.timedelta(minutes=draw(st.integers(0, 3)))
        if op == "put":
            rows.append(
                (
                    seq,
                    "put",
                    rowkey,
                    draw(st.sampled_from(FAMILIES)),
                    draw(st.sampled_from(QUALS)),
                    draw(st.sampled_from(VALUES)),
                    ts,
                )
            )
        else:
            rows.append((seq, "delete", rowkey, None, None, None, ts))
    return rows


def model_replay(rows) -> dict[str, dict[str, str]]:
    """Independent spec of the CDC semantics (SURVEY §2.1 #4/#7/#8):

    - last delete per key = max (ts, seq) over its deletes;
    - a put survives iff its (ts, seq) is strictly after that;
    - per (key, qualifier) the winner is the surviving put with max
      (ts, family, seq) — family before seq encodes the reference's
      NavigableMap family-byte-order collision rule.
    """
    last_del: dict[str, tuple] = {}
    for seq, op, rowkey, _f, _q, _v, ts in rows:
        if op == "delete":
            cur = last_del.get(rowkey)
            if cur is None or (ts, seq) > cur:
                last_del[rowkey] = (ts, seq)
    winners: dict[tuple, tuple] = {}
    for seq, op, rowkey, family, qual, value, ts in rows:
        if op != "put":
            continue
        if rowkey in last_del and (ts, seq) <= last_del[rowkey]:
            continue
        rank = (ts, family, seq)
        cur = winners.get((rowkey, qual))
        if cur is None or rank > cur[0]:
            winners[(rowkey, qual)] = (rank, value)
    state: dict[str, dict[str, str]] = {}
    for (rowkey, qual), (_rank, value) in winners.items():
        state.setdefault(rowkey, {})[qual] = value
    return state


def spark_replay(spark, rows) -> dict[str, dict[str, str]]:
    cf = spark.createDataFrame(rows, CHANGEFEED_SCHEMA)
    return {
        r["rowkey"]: dict(r["doc"]) for r in apply_changefeed(cf).collect()
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=mutations())
def test_replay_matches_model(spark, rows):
    assert spark_replay(spark, rows) == model_replay(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=mutations(), split=st.integers(min_value=0, max_value=12))
def test_replay_batch_split_invariant(spark, rows, split):
    """State(replay(all)) == merge(state(prefix), replay-over-it(suffix)):
    the property foreachBatch micro-batching relies on. Emulated by
    replaying prefix+suffix as one feed vs the whole feed — the split
    point must not matter because ordering is by (ts, seq), not arrival."""
    split = min(split, len(rows))
    reordered = rows[split:] + rows[:split]  # arrival order scrambled
    assert spark_replay(spark, reordered) == spark_replay(spark, rows)
