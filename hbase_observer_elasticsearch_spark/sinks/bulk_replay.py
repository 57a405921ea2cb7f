"""ES `_bulk` FAILURE semantics: per-item errors + transport faults, and
the retry/requeue client that converges anyway.

The reference's sink has three distinguishing failure behaviors this
module reproduces and *proves convergent* (r9 verdict directive #5):

- per-item bulk failures: variants A/B log-and-drop the failed item
  (observer6/ElasticSearchBulkOperator.java:85-90); variant C retries
  failed items (README_zh.md:305-312). We implement the C semantics —
  the only one compatible with an exactly-once final state — as
  ``post_bulk_with_retry``: items that come back with a retryable
  status are re-batched and re-POSTed alone.
- transport failure → requeue: on a connection error the whole bulk is
  re-queued and re-sent (observer6/ElasticSearchBulkOperator.java:91-98).
  The nasty sub-case is the LOST RESPONSE: the server applied the body
  but the client never heard back, so the replay double-applies the
  batch. Because every action is either a partial-doc upsert keyed by
  (_id, qualifier) with a fixed value or a whole-doc delete, replaying
  a bulk is ALGEBRAICALLY ABSORBED — the same property that makes the
  foreachBatch epoch replay idempotent in sinks/state_sink.py.

``FaultInjectingBulkEndpoint`` is the same in-memory document store the
wire-format test drives over real HTTP (tests/test_es_bulk_endpoint.py),
plus deterministic fault hooks. Determinism matters: the registered
query ``sink_bulk_failure_replay`` (operators/cdc.py) runs this under
the DuckDB oracle gate, so the injected faults must be a pure function
of the data, never of wall-clock or randomness.

ONE-ACTION-PER-ID RULE. Per-item retry is only order-safe if no two
actions in a body touch the same _id (a retried delete landing after a
same-body update would wipe it). The epoch builder therefore FUSES
"delete then surviving partial puts" into a single ES ``index`` action
(full-document replace) — the post-delete merge of partial docs IS a
full document. Result: every body's items commute, per-item retries and
whole-body replays are both absorbed, and the bulk needs fewer actions
than the reference's delete+update pairs — strictly better at scale.
"""

from __future__ import annotations

import hashlib
import json


def _stable_bucket(key: str, mod: int) -> int:
    """Deterministic, platform-independent bucket for an _id string."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % mod


class BulkTransportError(ConnectionError):
    """Stand-in for the IOException path the reference requeues on
    (observer6/ElasticSearchBulkOperator.java:91-98)."""


class FaultInjectingBulkEndpoint:
    """In-memory ES with bulk-action semantics + deterministic faults.

    Fault model (all opt-in via constructor args):
    - ``item_fail_mod``: an update/delete item whose _id hashes into
      bucket 0 (mod this value) gets a 429 TOO_MANY_REQUESTS — and is
      NOT applied — the FIRST time that _id is seen; later deliveries
      succeed (a transient per-shard rejection, ES's documented bulk
      partial-failure mode).
    - ``drop_request_before``: request ordinals that raise a transport
      error BEFORE applying anything (connection refused).
    - ``drop_response_after``: request ordinals that apply the WHOLE
      body and then raise (response lost in flight) — the replay-forcing
      case that distinguishes at-least-once from exactly-once.
    """

    def __init__(
        self,
        item_fail_mod: int = 0,
        drop_request_before: frozenset[int] = frozenset(),
        drop_response_after: frozenset[int] = frozenset(),
    ):
        self.docs: dict[str, dict[str, str]] = {}
        self.n_posts = 0
        self.n_item_rejections = 0
        self.n_transport_faults = 0
        self._item_fail_mod = item_fail_mod
        self._drop_before = set(drop_request_before)
        self._drop_after = set(drop_response_after)
        self._seen_ids: set[str] = set()

    def arm_drop_response_next(self) -> None:
        """Make the NEXT post apply fully and then lose its response —
        lets a caller schedule the fault at an epoch boundary without
        pre-computing retry-dependent post ordinals."""
        self._drop_after.add(self.n_posts)

    def _item_should_fail(self, _id: str) -> bool:
        if self._item_fail_mod and _id not in self._seen_ids:
            self._seen_ids.add(_id)
            return _stable_bucket(_id, self._item_fail_mod) == 0
        self._seen_ids.add(_id)
        return False

    def post(self, body: str) -> dict:
        """Apply one NDJSON bulk body; returns the ES bulk response dict.

        Raises BulkTransportError per the fault schedule — before any
        mutation for ``drop_request_before`` ordinals, after the full
        apply for ``drop_response_after`` ordinals.
        """
        ordinal = self.n_posts
        self.n_posts += 1
        if ordinal in self._drop_before:
            self.n_transport_faults += 1
            raise BulkTransportError(f"connection refused (post #{ordinal})")

        lines = [ln for ln in body.split("\n") if ln.strip()]
        items, i, any_err = [], 0, False
        while i < len(lines):
            act = json.loads(lines[i])
            if "index" in act:
                meta, payload = act["index"], json.loads(lines[i + 1])
                if self._item_should_fail(meta["_id"]):
                    self.n_item_rejections += 1
                    any_err = True
                    items.append(
                        {"index": {"_id": meta["_id"], "status": 429}}
                    )
                else:
                    self.docs[meta["_id"]] = dict(payload)  # full replace
                    items.append(
                        {"index": {"_id": meta["_id"], "status": 200}}
                    )
                i += 2
            elif "update" in act:
                meta, payload = act["update"], json.loads(lines[i + 1])
                assert payload.get("doc_as_upsert") is True
                if self._item_should_fail(meta["_id"]):
                    self.n_item_rejections += 1
                    any_err = True
                    items.append(
                        {"update": {"_id": meta["_id"], "status": 429}}
                    )
                else:
                    doc = self.docs.setdefault(meta["_id"], {})
                    doc.update(payload["doc"])
                    items.append(
                        {"update": {"_id": meta["_id"], "status": 200}}
                    )
                i += 2
            elif "delete" in act:
                meta = act["delete"]
                if self._item_should_fail(meta["_id"]):
                    self.n_item_rejections += 1
                    any_err = True
                    items.append(
                        {"delete": {"_id": meta["_id"], "status": 429}}
                    )
                else:
                    existed = self.docs.pop(meta["_id"], None) is not None
                    items.append(
                        {
                            "delete": {
                                "_id": meta["_id"],
                                "status": 200 if existed else 404,
                            }
                        }
                    )
                i += 1
            else:  # pragma: no cover — malformed body is a bug
                raise AssertionError(f"unknown bulk action: {act}")

        if ordinal in self._drop_after:
            self.n_transport_faults += 1
            raise BulkTransportError(f"response lost (post #{ordinal})")
        return {"took": 1, "errors": any_err, "items": items}


def split_line_pairs(lines: list[str]) -> list[list[str]]:
    """Group NDJSON lines into per-item units (delete = 1 line,
    update/index = action + doc = 2 lines)."""
    units, i = [], 0
    while i < len(lines):
        act = json.loads(lines[i])
        if "update" in act or "index" in act:
            units.append(lines[i : i + 2])
            i += 2
        else:
            units.append([lines[i]])
            i += 1
    return units


def post_bulk_with_retry(
    endpoint, lines: list[str], max_attempts: int = 8
) -> dict:
    """The reference's requeue + per-item-retry loop, made convergent.

    Transport error → resend the ENTIRE current body (requeue,
    observer6/ElasticSearchBulkOperator.java:91-98 — correct even for a
    lost response, because replayed upserts/deletes are absorbed).
    Response with ``errors: true`` → keep only the retryable items
    (status ≥ 400, except 404 on delete, which is terminal success for
    convergence purposes) and resend those (variant C,
    README_zh.md:305-312). Returns stats for assertion.

    PRECONDITION: the body follows the one-action-per-_id rule (module
    docstring) — per-item retry re-applies items out of original order,
    which is only sound when items commute.
    """
    units = split_line_pairs(lines)
    attempts = 0
    stats = {"posts": 0, "transport_retries": 0, "item_retries": 0}
    while units and attempts < max_attempts:
        attempts += 1
        body = "\n".join(ln for u in units for ln in u) + "\n"
        try:
            resp = endpoint.post(body)
            stats["posts"] += 1
        except BulkTransportError:
            stats["transport_retries"] += 1
            continue  # requeue: same units, next attempt
        if not resp["errors"]:
            return stats
        retry_units = []
        for unit, item in zip(units, resp["items"]):
            (kind, res), = item.items()
            status = res["status"]
            if status >= 400 and not (kind == "delete" and status == 404):
                retry_units.append(unit)
        stats["item_retries"] += len(retry_units)
        units = retry_units
    if units:  # pragma: no cover — convergence failure is a bug
        raise RuntimeError(f"bulk did not converge after {attempts} attempts")
    return stats


def epoch_bulk_lines(
    ep,
    index: str = "docs",
    order_cols: tuple[str, ...] = ("ts", "family", "seq"),
    del_order_cols: tuple[str, ...] = ("ts", "seq"),
    value_col: str = "value",
) -> list[str]:
    """Compact one epoch of changefeed mutations into NDJSON bulk lines
    obeying the one-action-per-_id rule.

    Per rowkey: survivors are puts strictly after the epoch's last
    delete (ordered by ``del_order_cols``); the doc keeps the latest put
    per qualifier (ordered by ``order_cols``, which must end in a
    tiebreak-unique column such as seq). A key with a delete and no
    survivors emits one `delete`; delete + survivors FUSE into one
    full-doc `index`; puts only emit one partial-doc `update`
    (doc_as_upsert). The returned list is rowkey-ordered for
    deterministic bodies.

    Driver-side collect is bounded by live keys (post-compaction), not
    mutations; a cluster deployment runs the identical plan and POSTs
    per partition instead of collecting.
    """
    from pyspark.sql import functions as F

    from .bulk_format import (
        action_line,
        doc_line,
        index_action_line,
        index_doc_line,
    )

    deleted = (
        ep.filter(F.col("op") == "delete")
        .groupBy("rowkey")
        .agg(
            F.max(F.struct(*[F.col(c) for c in del_order_cols])).alias(
                "__dcut"
            )
        )
    )
    latest = (
        ep.filter(F.col("op") == "put")
        .join(deleted, "rowkey", "left")
        .filter(
            F.col("__dcut").isNull()
            | (F.struct(*[F.col(c) for c in del_order_cols]) > F.col("__dcut"))
        )
        .groupBy("rowkey", "qualifier")
        .agg(
            F.max(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    F.col(value_col).cast("string").alias("__v"),
                )
            ).alias("m")
        )
    )
    docs = latest.groupBy("rowkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("qualifier", F.col("m.__v")))
            )
        ).alias("doc")
    )
    merged = deleted.join(docs, "rowkey", "full")
    has_del = F.col("__dcut").isNotNull()
    has_doc = F.col("doc").isNotNull()
    rows = (
        merged.select(
            "rowkey",
            F.when(
                has_del & ~has_doc,
                action_line(F.col("rowkey"), F.lit(True), index),
            )
            .when(has_del & has_doc, index_action_line(F.col("rowkey"), index))
            .otherwise(action_line(F.col("rowkey"), F.lit(False), index))
            .alias("a"),
            F.when(has_del & has_doc, index_doc_line(F.col("doc")))
            .when(~has_del, doc_line(F.col("doc")))
            .alias("d"),
        )
        .orderBy("rowkey")
        .collect()
    )
    lines: list[str] = []
    for r in rows:
        lines.append(r["a"])
        if r["d"] is not None:
            lines.append(r["d"])
    return lines
