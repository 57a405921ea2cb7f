"""Custom stateful streaming operator: per-key LWW doc assembly via
``applyInPandasWithState`` (SURVEY §2.3 "stateful last-write-wins").

The declarative pipeline (streaming/pipeline.py) rebuilds doc state with a
foreachBatch MERGE against a state *table*; this operator instead keeps the
doc in **Spark-managed keyed state**, the shape to use when consumers need
the updated document pushed per micro-batch (e.g. straight into an ES bulk
upsert) without re-reading a state table.

Semantics are identical to the sink MERGE (tests assert parity with
EXPECTED_STATE):
- winner per (rowkey, qualifier) = max (ts, family, seq) — family byte-order
  breaks same-ts collisions exactly like the reference's NavigableMap
  iteration (observer6/HbaseDataSyncEsObserver.java:93-102);
- a delete is a whole-doc tombstone at (ts, seq) (delete widening,
  observer6/HbaseDataSyncEsObserver.java:127-129): cells at or before it are
  dead, later cells survive (delete-then-reinsert works);
- merge order across/within micro-batches is irrelevant (pure max-merge),
  so the operator is replay/duplicate tolerant — exactly-once end state on
  top of at-least-once delivery.

Scale design (100 TB changefeed):
- state is partitioned by rowkey across executors (one shuffle per batch,
  same key partitioning reused every epoch by the state store);
- per-key state is the current doc (bounded by row width), with dead cells
  pruned on every tombstone application;
- at real scale add a state TTL via ``GroupStateTimeout`` (keys idle past
  the retention horizon are evicted and re-hydrated from the lakehouse
  state table on next touch).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.changefeed import CHANGEFEED_SCHEMA

# state: one JSON blob per key:
#   {"cells": {qualifier: [value, ts_ns, family, seq]}, "tomb": [ts_ns, seq],
#    "n": <total mutations merged so far>}
# "n" is the emitted version stamp: per-key monotone across micro-batches
# (the file source does NOT guarantee batch order = event order, and
# max-merge doesn't need it — but consumers need to know which emission
# is newest).
_STATE_SCHEMA = "state_json string"
_OUTPUT_SCHEMA = "rowkey string, doc_json string, version long, evicted boolean"


def _cell_key(ts_ns: int, family: str, seq: int) -> tuple:
    return (ts_ns, family or "", seq)


def _apply_mutations(state_doc: dict, pdf: pd.DataFrame) -> None:
    """Max-merge one pandas chunk of mutations into the state dict."""
    cells: dict = state_doc.setdefault("cells", {})
    tomb = state_doc.get("tomb")
    state_doc["n"] = state_doc.get("n", 0) + len(pdf)
    ts_ns = pdf["ts"].astype("int64")  # pandas datetime64[ns] → ns since epoch
    for op, qual, val, fam, seq, t in zip(
        pdf["op"], pdf["qualifier"], pdf["value"], pdf["family"],
        pdf["seq"], ts_ns,
    ):
        seq = int(seq)
        t = int(t)
        if op == "delete":
            if tomb is None or (t, seq) > tuple(tomb):
                tomb = [t, seq]
        else:
            old = cells.get(qual)
            if old is None or _cell_key(t, fam, seq) > _cell_key(
                old[1], old[2], old[3]
            ):
                cells[qual] = [val, t, fam, seq]
    if tomb is not None:
        state_doc["tomb"] = tomb
        # prune cells killed by the tombstone (bounds state size)
        dead = [q for q, c in cells.items() if (c[1], c[3]) <= (tomb[0], tomb[1])]
        for q in dead:
            del cells[q]


def _emit(rowkey: str, state_doc: dict, evicted: bool) -> pd.DataFrame:
    doc = {q: c[0] for q, c in state_doc.get("cells", {}).items()}
    return pd.DataFrame(
        {
            "rowkey": [rowkey],
            "doc_json": [json.dumps(doc, sort_keys=True)],
            "version": [state_doc.get("n", 0)],
            "evicted": [evicted],
        }
    )


def _make_handler(ttl_ms: int | None):
    def _lww_doc_state(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (rowkey,) = key
        if ttl_ms is not None and state.hasTimedOut:
            # retention horizon passed with no touch: emit the final doc
            # flagged evicted, drop the keyed state. A later mutation
            # re-hydrates from the lakehouse state table (sink side) —
            # this bounds state by the ACTIVE key set, not the key space.
            state_doc = json.loads(state.get[0]) if state.exists else {}
            state.remove()
            yield _emit(rowkey, state_doc, evicted=True)
            return
        state_doc = json.loads(state.get[0]) if state.exists else {}
        for pdf in pdfs:
            _apply_mutations(state_doc, pdf)
        state.update((json.dumps(state_doc),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield _emit(rowkey, state_doc, evicted=False)

    return _lww_doc_state


def stateful_doc_state(
    spark: SparkSession,
    changefeed_dir: str,
    max_files_per_trigger: int = 1,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming LWW document state with Spark-managed per-key state.

    Emits (rowkey, doc_json, version, evicted) for every key touched in
    each micro-batch — doc_json "{}" marks a fully-deleted doc (the
    upsert/delete discriminator a downstream ES writer needs).

    ``ttl_ms`` arms a processing-time state TTL (SURVEY §7 "what's hard"
    #1): keys idle past the horizon emit one final ``evicted=true`` row
    and their state is dropped — the 100 TB requirement that keyed state
    track the active working set instead of growing with key cardinality.
    """
    cf = (
        spark.readStream.schema(CHANGEFEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changefeed_dir)
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return cf.groupBy("rowkey").applyInPandasWithState(
        _make_handler(ttl_ms),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Second-generation stateful API: transformWithStateInPandas (Spark 4.x).
# Same LWW semantics as the applyInPandasWithState operator above, but the
# doc lives in TYPED Spark state: a MapState keyed by qualifier plus a
# small ValueState for (tombstone, version). With the RocksDB state store
# this makes a put touch ONE map entry instead of rewriting a whole
# serialized JSON blob per key — the difference that matters when docs are
# wide and mutations are narrow (the reference's exact workload shape:
# single-cell HBase puts, observer6/HbaseDataSyncEsObserver.java:93-102).
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard exercised implicitly
    # The TWS state protocol speaks protobuf between the JVM and the Python
    # driver worker; without the protobuf wheel the query crashes at
    # PRE_INIT (observed: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE,
    # ImportError google.protobuf.descriptor). This container has no
    # protobuf and installs are out of scope, so the operator is a
    # documented environment-gated swap point, exactly like the multimodal
    # codec stubs (operators/multimodal.py) — the processor logic itself is
    # complete and parity-tested wherever the wheel exists
    # (tests/test_streaming.py::test_tws_doc_state_parity skips without it).
    import google.protobuf  # noqa: F401

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # Spark < 4.0 or no protobuf wheel
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

_TWS_CELL_KEY_SCHEMA = "qualifier string"
_TWS_CELL_VAL_SCHEMA = "value string, ts_ns long, family string, seq long"
_TWS_META_SCHEMA = "tomb_ts long, tomb_seq long, n long"


class LwwDocProcessor(StatefulProcessor):
    """Per-key LWW doc assembly on typed state primitives."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.cells = handle.getMapState(
            "cells", _TWS_CELL_KEY_SCHEMA, _TWS_CELL_VAL_SCHEMA
        )
        self.meta = handle.getValueState("meta", _TWS_META_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (rowkey,) = key
        tomb_ts, tomb_seq, n = (
            self.meta.get() if self.meta.exists() else (None, None, 0)
        )
        for pdf in rows:
            n += len(pdf)
            ts_ns = pdf["ts"].astype("int64")
            for op, qual, val, fam, seq, t in zip(
                pdf["op"], pdf["qualifier"], pdf["value"], pdf["family"],
                pdf["seq"], ts_ns,
            ):
                seq, t = int(seq), int(t)
                if op == "delete":
                    if tomb_ts is None or (t, seq) > (tomb_ts, tomb_seq):
                        tomb_ts, tomb_seq = t, seq
                else:
                    old = (
                        self.cells.getValue((qual,))
                        if self.cells.containsKey((qual,))
                        else None
                    )
                    if old is None or _cell_key(t, fam, seq) > _cell_key(
                        old[1], old[2], old[3]
                    ):
                        self.cells.updateValue((qual,), (val, t, fam, seq))
        if tomb_ts is not None:
            # prune map entries the tombstone killed (bounds state size);
            # one pass over THIS key's map only
            dead = [
                k
                for k, v in self.cells.iterator()
                if (v[1], v[3]) <= (tomb_ts, tomb_seq)
            ]
            for k in dead:
                self.cells.removeKey(k)
        self.meta.update((tomb_ts, tomb_seq, n))
        doc = {k[0]: v[0] for k, v in self.cells.iterator()}
        yield pd.DataFrame(
            {
                "rowkey": [rowkey],
                "doc_json": [json.dumps(doc, sort_keys=True)],
                "version": [n],
                "evicted": [False],
            }
        )

    def close(self) -> None:
        pass


def stateful_doc_state_tws(
    spark: SparkSession,
    changefeed_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """transformWithStateInPandas twin of :func:`stateful_doc_state` —
    identical emission contract (rowkey, doc_json, version, evicted), so
    the two stateful APIs are interchangeable downstream and parity-tested
    against the same golden state."""
    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and the "
            "protobuf wheel (the TWS JVM<->Python state protocol); gate "
            "callers on streaming.stateful._HAS_TWS"
        )
    cf = (
        spark.readStream.schema(CHANGEFEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changefeed_dir)
    )
    return cf.groupBy("rowkey").transformWithStateInPandas(
        statefulProcessor=LwwDocProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- streaming debounce (gap-based duplicate suppression) -------------------

_DEBOUNCE_STATE = "last_json string"
_DEBOUNCE_OUTPUT = "seq long, rowkey string, qualifier string, ts timestamp"


def _make_debounce_handler(gap_us: int):
    def _debounce(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # keyed by rowkey only; per-qualifier last-seen micros live in a
        # tiny dict (state group count = active keys, not keys×qualifiers
        # — 5× fewer pandas invocations per micro-batch at this feed).
        #
        # r14 optimization round (guide §4.2): the gap decision is
        # "previous RAW event of the same qualifier, kept or not" — a
        # per-qualifier shift(1) over the (ts, seq)-sorted batch, seeded
        # from keyed state for each qualifier's first row. Vectorized
        # pandas replaces the per-row Python loop; emission and the
        # stored last-raw map are identical (the changefeed files are
        # contiguous time ranges, so sorting the whole batch restores
        # global per-key time order exactly as before).
        last: dict[str, int] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((json.dumps(last),))
            return
        pdf = (
            frames[0]
            if len(frames) == 1
            else pd.concat(frames, ignore_index=True)
        )
        pdf = pdf.sort_values(["ts", "seq"])
        q = pdf["qualifier"].fillna("")
        t_us = pdf["ts"].astype("int64") // 1000
        prev = t_us.groupby(q).shift(1)
        seed = q.map(last)  # NaN where the qualifier has no state yet
        prev = prev.fillna(seed)
        keep = prev.isna() | ((t_us - prev) > gap_us)
        kept = pdf.loc[keep.to_numpy(), ["seq", "rowkey", "qualifier", "ts"]]
        # last raw per qualifier = the final (sorted) row of each group
        tail = t_us.groupby(q).last()
        last.update({str(k): int(v) for k, v in tail.items()})
        state.update((json.dumps(last),))
        if len(kept):
            yield kept

    return _debounce


def stateful_debounce(
    spark: SparkSession,
    changefeed_dir: str,
    gap_us: int,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming gap-based debounce: suppress changefeed mutations of the
    same (rowkey, qualifier) arriving within ``gap_us`` of the previous
    raw mutation — the streaming twin of the events_debounce batch
    operator (operators/time_windows.py), with the previous-event
    timestamp as the ONLY keyed state (one long per active key: the
    minimal possible stateful-operator footprint, vs the LWW doc state
    above which carries the whole document).
    """
    cf = (
        spark.readStream.schema(CHANGEFEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changefeed_dir)
    )
    return cf.groupBy("rowkey").applyInPandasWithState(
        _make_debounce_handler(gap_us),
        outputStructType=_DEBOUNCE_OUTPUT,
        stateStructType=_DEBOUNCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming IVM deltas (live-rollup maintenance at ingest) ---------------

_IVM_FEED_SCHEMA = (
    "rowkey long, seq long, is_del boolean, value double, "
    "epoch long, grp long"
)
_IVM_STATE = "live boolean, value double"
_IVM_OUTPUT = (
    "grp long, epoch long, live_now boolean, val_now double, "
    "prev_live boolean, prev_value double"
)


def _ivm_delta_handler(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-rowkey LWW delta emitter: keyed state is (live, last raw
    value); each update emits the (now, prev) pair the downstream
    decimal fold turns into exact (cnt, value) deltas — the streaming
    half of operators/skew_agg.cdc_live_rollup_ivm. State stores the
    previous row's RAW value even for tombstones (prev_live masks it),
    bit-matching the batch LAG chain.

    r14 optimization round (guide §4.2): the per-row Python loop is a
    vectorized shift — prev = the seq-sorted batch shifted by one with
    the keyed state as the seed. Identical emission: the (now, prev)
    chain is exactly a LAG over the key's full seq order, and the feed
    files are contiguous seq ranges, so sorting the whole micro-batch
    chunk set by seq reproduces the global per-key order."""
    import numpy as np

    if state.exists:
        live, val = bool(state.get[0]), float(state.get[1])
    else:
        live, val = False, 0.0
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        pdf = (
            frames[0]
            if len(frames) == 1
            else pd.concat(frames, ignore_index=True)
        )
        pdf = pdf.sort_values("seq")
        now_live = ~pdf["is_del"].to_numpy(dtype=bool)
        vals = pdf["value"].to_numpy(dtype="float64")
        prev_live = np.concatenate(([live], now_live[:-1]))
        prev_val = np.concatenate(([val], vals[:-1]))
        out = pd.DataFrame(
            {
                "grp": pdf["grp"].to_numpy(dtype="int64"),
                "epoch": pdf["epoch"].to_numpy(dtype="int64"),
                "live_now": now_live,
                "val_now": vals,
                "prev_live": prev_live,
                "prev_value": prev_val,
            }
        )
        live, val = bool(now_live[-1]), float(vals[-1])
        state.update((live, val))
        yield out
        return
    state.update((bool(live), float(val)))


def stateful_ivm_deltas(
    spark: SparkSession,
    feed_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming per-update delta stream for live-rollup IVM: one
    (live, value) pair of keyed state per rowkey, emission = one row per
    mutation carrying (now, prev) — O(active keys) state however long
    the feed runs, the same bound as the LWW doc state above."""
    from pyspark.sql.types import _parse_datatype_string

    cf = (
        spark.readStream.schema(_parse_datatype_string(_IVM_FEED_SCHEMA))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )
    return cf.groupBy("rowkey").applyInPandasWithState(
        _ivm_delta_handler,
        outputStructType=_IVM_OUTPUT,
        stateStructType=_IVM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
