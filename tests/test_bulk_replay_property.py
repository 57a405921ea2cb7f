"""Property test: the bulk retry/requeue client converges to the clean
final state under ANY deterministic fault schedule, for any sequence of
one-action-per-_id bulk bodies (sinks/bulk_replay.py). Pure Python — no
Spark — so Hypothesis can sweep hundreds of schedules cheaply.

The property IS the exactly-once claim: per-item 429s on first
delivery, connection-refused-before-apply and lost-response-after-apply
faults, in any combination, must leave the document store identical to
a fault-free application of the same bodies in the same order.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_elasticsearch_spark.sinks.bulk_replay import (
    FaultInjectingBulkEndpoint,
    post_bulk_with_retry,
)

_IDS = [f"r{i}" for i in range(8)]
_QUALS = ["c1", "c2", "c3"]


def _action(kind: str, _id: str, doc: dict | None) -> list[str]:
    meta = json.dumps({"_index": "docs", "_type": "_doc", "_id": _id})
    if kind == "delete":
        return ['{"delete":' + meta + "}"]
    if kind == "index":
        return ['{"index":' + meta + "}", json.dumps(doc)]
    return [
        '{"update":' + meta + "}",
        json.dumps({"doc": doc, "doc_as_upsert": True}),
    ]


# one epoch body: a per-_id choice of action (at most once per _id),
# honoring the one-action-per-_id rule the real builder enforces
_epoch = st.lists(
    st.tuples(
        st.sampled_from(_IDS),
        st.sampled_from(["update", "index", "delete"]),
        st.dictionaries(
            st.sampled_from(_QUALS), st.text(max_size=3), max_size=3
        ),
    ),
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=200, deadline=None)
@given(
    epochs=st.lists(_epoch, min_size=1, max_size=4),
    fail_mod=st.sampled_from([0, 1, 2, 3]),
    drop_before=st.sets(st.integers(0, 6), max_size=3),
    lost_response_epochs=st.sets(st.integers(0, 3), max_size=2),
)
def test_any_fault_schedule_converges(
    epochs, fail_mod, drop_before, lost_response_epochs
):
    bodies = []
    for ep in epochs:
        lines: list[str] = []
        for _id, kind, doc in ep:
            lines.extend(
                _action(kind, _id, doc if kind != "delete" else None)
            )
        bodies.append(lines)

    clean = FaultInjectingBulkEndpoint()
    for lines in bodies:
        post_bulk_with_retry(clean, lines)

    faulty = FaultInjectingBulkEndpoint(
        item_fail_mod=fail_mod, drop_request_before=frozenset(drop_before)
    )
    for i, lines in enumerate(bodies):
        if i in lost_response_epochs:
            faulty.arm_drop_response_next()
        post_bulk_with_retry(faulty, lines, max_attempts=16)

    assert faulty.docs == clean.docs
