"""Streaming pipeline: stream/batch parity, epoch compaction, idempotent
sink MERGE, checkpoint restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_elasticsearch_spark.operators.cdc import apply_changefeed
from hbase_observer_elasticsearch_spark.sinks.state_sink import EmulatedEsSink
from hbase_observer_elasticsearch_spark.sources.changefeed import (
    EXPECTED_STATE,
    _ts,
    fixture_changefeed,
    write_changefeed_stream_dir,
)
from hbase_observer_elasticsearch_spark.streaming.pipeline import (
    compact_epoch,
    start_pipeline,
)


def state_as_dict(df) -> dict:
    return {r["rowkey"]: dict(r["doc"]) for r in df.collect()}


def test_stream_batch_parity(spark, tmp_path):
    """Drain the fixture changefeed through the streaming pipeline in
    multiple micro-batches; final sink state must equal the batch replay."""
    cf_dir = str(tmp_path / "cf")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cf = fixture_changefeed(spark)
    write_changefeed_stream_dir(cf, cf_dir, n_files=4)

    q = start_pipeline(
        spark, cf_dir, state_dir, ckpt, trigger={"availableNow": True},
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    sink = EmulatedEsSink(spark, state_dir)
    got = state_as_dict(sink.read_state())
    assert got == EXPECTED_STATE
    assert got == state_as_dict(apply_changefeed(cf))


def test_stream_restart_idempotent(spark, tmp_path):
    """Restarting from checkpoint with no new data must not change state."""
    cf_dir = str(tmp_path / "cf")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=2)

    for _ in range(2):  # second run: nothing new to process
        q = start_pipeline(
            spark, cf_dir, state_dir, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination(120)

    sink = EmulatedEsSink(spark, state_dir)
    assert state_as_dict(sink.read_state()) == EXPECTED_STATE


def test_compact_epoch(spark):
    """Epoch compaction: latest put per (rowkey, qualifier) + latest delete
    per key, at cell granularity with versions."""
    cf = fixture_changefeed(spark)
    cells, dels = compact_epoch(cf)
    got = {(r["rowkey"], r["qualifier"]): r["value"] for r in cells.collect()}
    assert got[("r1", "c1")] == "v1b"
    assert got[("r2", "c1")] == "new"  # latest, not the pre-delete value
    assert got[("r3", "c1")] == "from_b"  # family byte-order collision
    assert got[("r4", "c1")] == "winner"  # out-of-order resolved by ts
    assert {r["rowkey"] for r in dels.collect()} == {"r2", "r5"}


def _cells(spark, rows):
    return spark.createDataFrame(
        [(k, q, v, _ts(m), s) for (k, q, v, m, s) in rows],
        "rowkey string, qualifier string, value string, ts timestamp, seq long",
    )


def _dels(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(m), s) for (k, m, s) in rows],
        "rowkey string, ts timestamp, seq long",
    )


def test_sink_lww_merge_semantics(spark, tmp_path):
    """The MERGE is last-write-wins by (ts, seq), not by arrival epoch:
    stale cells and late tombstones from earlier mutation times lose."""
    sink = EmulatedEsSink(spark, str(tmp_path / "s"))
    e = _dels(spark, [])
    # epoch 1: two qualifiers
    sink.apply(_cells(spark, [("a", "x", "1", 5, 50), ("a", "y", "2", 5, 51)]), e)
    # epoch 2: newer y, plus a STALE x from an earlier mutation time → loses
    sink.apply(_cells(spark, [("a", "y", "9", 6, 60), ("a", "x", "0", 1, 10)]), e)
    assert state_as_dict(sink.read_state()) == {"a": {"x": "1", "y": "9"}}
    # epoch 3: tombstone at minute 7 kills everything so far
    sink.apply(_cells(spark, []), _dels(spark, [("a", 7, 70)]))
    assert state_as_dict(sink.read_state()) == {}
    # epoch 4: a stale pre-delete put arrives late → tombstone still wins
    sink.apply(_cells(spark, [("a", "x", "ghost", 6, 65)]), e)
    assert state_as_dict(sink.read_state()) == {}
    # epoch 5: a genuinely newer put re-inserts the doc
    sink.apply(_cells(spark, [("a", "x", "alive", 8, 80)]), e)
    assert state_as_dict(sink.read_state()) == {"a": {"x": "alive"}}


def test_stream_parity_any_file_split(spark, tmp_path):
    """Final state must be invariant to how the feed splits into epochs
    (the bug class the 4-file-only test missed: a 3-file split used to
    let arrival order override mutation order)."""
    for n_files in (1, 2, 3, 5):
        cf_dir = str(tmp_path / f"cf{n_files}")
        state_dir = str(tmp_path / f"state{n_files}")
        ckpt = str(tmp_path / f"ckpt{n_files}")
        write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files)
        q = start_pipeline(
            spark, cf_dir, state_dir, ckpt, trigger={"availableNow": True}
        )
        q.awaitTermination(120)
        got = state_as_dict(EmulatedEsSink(spark, state_dir).read_state())
        assert got == EXPECTED_STATE, f"n_files={n_files}: {got}"


def test_streaming_latest_state_query(spark, tmp_path):
    """The declarative streaming LWW aggregation drains to the same
    per-qualifier latest values as the batch replay."""
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_latest_state,
    )

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=2)
    q = (
        streaming_latest_state(spark, cf_dir)
        .writeStream.format("memory")
        .queryName("lww")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in spark.sql("SELECT * FROM lww").collect()
    }
    # latest put per (rowkey, qualifier) — deletes are not modeled here
    assert got[("r1", "c1")] == "v1b"
    assert got[("r4", "c1")] == "winner"
    assert got[("r2", "c1")] == "new"


def test_stateful_lww_applyinpandaswithstate(spark, tmp_path):
    """applyInPandasWithState doc assembly: final emitted doc per key equals
    the batch-replay golden state; deleted keys emit an empty doc."""
    import json

    from hbase_observer_elasticsearch_spark.streaming.stateful import (
        stateful_doc_state,
    )

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=4)

    q = (
        stateful_doc_state(spark, cf_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("lww_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(
        """SELECT rowkey, doc_json FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY rowkey
                                          ORDER BY version DESC) rn
             FROM lww_state) WHERE rn = 1"""
    ).collect()
    got = {r["rowkey"]: json.loads(r["doc_json"]) for r in rows}
    assert {k: v for k, v in got.items() if v} == EXPECTED_STATE
    assert got["r5"] == {}  # tombstoned key emits the delete marker


def test_streaming_windowed_counts_late_drop(spark, tmp_path):
    """Watermarked tumbling-window agg: windows emit once (append mode)
    when the watermark passes, and a row later than the watermark is
    dropped rather than re-opening its window."""
    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        CHANGEFEED_SCHEMA,
    )
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_windowed_mutation_counts,
    )

    cf_dir = tmp_path / "wcf"

    def row(seq, minute, sec):
        return (seq, "put", f"r{seq}", "info", "c", "v", _ts(minute, sec))

    spark.createDataFrame(
        [row(1, 0, 10), row(2, 0, 20), row(3, 5, 0)], CHANGEFEED_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(cf_dir))

    q = (
        streaming_windowed_mutation_counts(spark, str(cf_dir))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # seq 4 is 3.5 min late (watermark sits at 4:00 after batch 1) →
        # dropped; seq 5 advances the watermark so window [5:00,6:00) emits
        spark.createDataFrame(
            [row(4, 0, 30), row(5, 8, 0)], CHANGEFEED_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(cf_dir))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["win_start"].minute, r["op"]): r["n_mutations"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[(0, "put")] == 2  # late seq-4 row NOT counted
    assert got[(5, "put")] == 1


def test_streaming_session_windows_merge(spark, tmp_path):
    """Bursts within the gap fuse into one session; a ≥gap pause splits."""
    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        CHANGEFEED_SCHEMA,
    )
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_mutation_sessions,
    )

    cf_dir = tmp_path / "scf"

    def row(seq, minute, sec=0):
        return (seq, "put", "r1", "info", "c", "v", _ts(minute, sec))

    # burst at 0:00-0:30 (3 events), pause > 2 min, burst at 5:00; a late
    # closer row at minute 20 pushes the watermark past both sessions
    spark.createDataFrame(
        [row(1, 0, 0), row(2, 0, 30), row(3, 1, 0), row(4, 5, 0), row(5, 20, 0)],
        CHANGEFEED_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(cf_dir))

    q = (
        streaming_mutation_sessions(spark, str(cf_dir))
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["sess_start"].minute, r["n_mutations"])
        for r in spark.sql("SELECT * FROM sessions WHERE rowkey='r1'").collect()
    }
    assert (0, 3) in got  # three events fused into one session
    assert (5, 1) in got  # separated burst is its own session


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Redelivered (rowkey, seq) mutations inside the watermark are
    suppressed; distinct seqs all pass."""
    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        CHANGEFEED_SCHEMA,
    )
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_dedup_within_watermark,
    )

    cf_dir = tmp_path / "dcf"

    def row(seq, minute):
        return (seq, "put", "r1", "info", "c", f"v{seq}", _ts(minute))

    # seq 1 delivered three times (same batch and a later batch), seq 2 once
    spark.createDataFrame(
        [row(1, 0), row(1, 0), row(2, 1)], CHANGEFEED_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(cf_dir))

    q = (
        streaming_dedup_within_watermark(spark, str(cf_dir))
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [row(1, 2)], CHANGEFEED_SCHEMA  # redelivery, still in horizon
        ).coalesce(1).write.mode("append").parquet(str(cf_dir))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT seq, COUNT(*) n FROM dedup_wm GROUP BY seq").collect()
    got = {r["seq"]: r["n"] for r in rows}
    assert got == {1: 1, 2: 1}


def test_cdc_replicator_facade(spark, tmp_path):
    """Bind → start → drained → state == golden; stop is re-entrant."""
    from hbase_observer_elasticsearch_spark.replicator import CdcReplicator

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=4)

    rep = CdcReplicator(
        spark, cf_dir, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    rep.start(trigger={"availableNow": True}, max_files_per_trigger=1)
    rep.await_drained()
    rep.stop()
    rep.stop()  # idempotent

    assert state_as_dict(rep.state()) == EXPECTED_STATE
    # tombstoned key visible at cell level, absent from the doc view
    cells = rep.cells()
    assert cells.filter("rowkey = 'r5' AND qualifier IS NULL").count() == 1


def test_await_drained_raises_on_timeout(spark, tmp_path):
    """ADVICE r11: a drain that does not finish must raise, not silently
    hand back a partially-replicated state table."""
    from hbase_observer_elasticsearch_spark.replicator import CdcReplicator

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=4)

    rep = CdcReplicator(
        spark, cf_dir, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    # default 30s processing-time trigger: the query stays active forever,
    # so a tiny await_drained window must time out loudly.
    rep.start(max_files_per_trigger=1)
    try:
        import pytest as _pytest

        with _pytest.raises(TimeoutError, match="did not drain"):
            rep.await_drained(timeout_s=1)
    finally:
        rep.stop()


def test_cf_files_env_var_validation(monkeypatch, spark):
    """ADVICE r11: a non-integer SPARK_GRAFT_CF_FILES names the knob."""
    import pytest as _pytest

    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        shared_changefeed_stream_dir,
    )

    monkeypatch.setenv("SPARK_GRAFT_CF_FILES", "two")
    with _pytest.raises(ValueError, match="SPARK_GRAFT_CF_FILES"):
        shared_changefeed_stream_dir(spark, "/root/testdata/sf0.001")


def test_stateful_ttl_eviction(spark, tmp_path):
    """Keys idle past the TTL emit one final evicted=true row, state drops,
    and a later mutation restarts from clean state.

    NOTE: no processAllAvailable here — an armed ProcessingTimeTimeout
    keeps the engine scheduling timeout-sweep batches, so 'all available'
    never settles; poll the sink with deadlines instead.
    """
    import json
    import time

    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        CHANGEFEED_SCHEMA,
    )
    from hbase_observer_elasticsearch_spark.streaming.stateful import (
        stateful_doc_state,
    )

    cf_dir = tmp_path / "tcf"

    def put(seq, rowkey, qual, val, minute):
        return (seq, "put", rowkey, "info", qual, val, _ts(minute))

    def wait_for(sql_cond, deadline_s=60):
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            rows = spark.sql(
                f"SELECT * FROM ttl_state WHERE {sql_cond}"
            ).collect()
            if rows:
                return rows
            time.sleep(0.5)
        raise AssertionError(f"timed out waiting for: {sql_cond}")

    spark.createDataFrame(
        [put(1, "r1", "c1", "v1", 0)], CHANGEFEED_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(cf_dir))

    q = (
        stateful_doc_state(spark, str(cf_dir), ttl_ms=1000)
        .writeStream.format("memory")
        .queryName("ttl_state")
        .outputMode("update")
        .start()
    )
    try:
        wait_for("rowkey='r1' AND NOT evicted")
        evicted = wait_for("rowkey='r1' AND evicted")  # TTL sweep fires
        assert json.loads(evicted[0]["doc_json"]) == {"c1": "v1"}

        spark.createDataFrame(
            [put(3, "r1", "c2", "v2", 2)], CHANGEFEED_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(cf_dir))
        fresh = wait_for(
            "rowkey='r1' AND NOT evicted AND doc_json LIKE '%c2%'"
        )
        # state restarted post-eviction: only c2, version counter reset
        assert json.loads(fresh[0]["doc_json"]) == {"c2": "v2"}
        assert fresh[0]["version"] == 1
    finally:
        q.stop()


def test_bucketed_state_sink_parity_and_incrementality(spark, tmp_path):
    """BucketedStateSink produces the same final state as EmulatedEsSink
    over the same epochs, and an epoch leaves untouched buckets' files
    alone (incremental IO)."""
    import os

    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
    )
    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        FIXTURE_ROWS,
        fixture_changefeed,
    )

    sink = BucketedStateSink(spark, str(tmp_path / "bstate"), n_buckets=8)
    cf = fixture_changefeed(spark)
    # replay the fixture in two epochs split mid-stream
    half = len(FIXTURE_ROWS) // 2
    for lo, hi in [(0, half), (half, len(FIXTURE_ROWS) + 1)]:
        batch = cf.filter(f"seq >= {lo} AND seq < {hi}")
        cells, dels = compact_epoch(batch)
        sink.apply(cells, dels)

    assert state_as_dict(sink.read_state()) == EXPECTED_STATE

    # incrementality: an epoch touching ONE key rewrites only its bucket
    before = {
        d: sorted(os.listdir(os.path.join(str(tmp_path / "bstate"), d)))
        for d in os.listdir(str(tmp_path / "bstate"))
        if d.startswith("bkt=")
    }
    one = spark.createDataFrame(
        [(99, "put", "r1", "a", "c9", "x", _ts(9))], cf.schema
    )
    cells, dels = compact_epoch(one)
    sink.apply(cells, dels)
    after = {
        d: sorted(os.listdir(os.path.join(str(tmp_path / "bstate"), d)))
        for d in os.listdir(str(tmp_path / "bstate"))
        if d.startswith("bkt=")
    }
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1  # only r1's bucket rewritten
    assert state_as_dict(sink.read_state())["r1"]["c9"] == "x"


def test_bucketed_state_sink_replay_idempotent(spark, tmp_path):
    """Re-applying the same epoch (checkpoint replay after crash) leaves
    the state unchanged."""
    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
    )

    sink = BucketedStateSink(spark, str(tmp_path / "bstate"), n_buckets=4)
    cf = fixture_changefeed(spark)
    cells, dels = compact_epoch(cf)
    sink.apply(cells, dels)
    first = state_as_dict(sink.read_state())
    sink.apply(cells, dels)  # replay
    assert state_as_dict(sink.read_state()) == first == EXPECTED_STATE


def test_cross_epoch_family_tiebreak(spark, tmp_path):
    """Same-ts puts to one (rowkey, qualifier) from different families must
    resolve by family byte order even when they land in DIFFERENT epochs
    with seq order inverted — streamed state equals batch replay under any
    epoch split (the r3 collision, split across epochs)."""
    cols = "seq long, op string, rowkey string, family string, qualifier string, value string, ts timestamp"
    row_z = (1, "put", "rx", "z", "c1", "vz", _ts(5))  # lower seq, family z
    row_a = (2, "put", "rx", "a", "c1", "va", _ts(5))  # higher seq, family a

    expected = state_as_dict(
        apply_changefeed(spark.createDataFrame([row_z, row_a], cols))
    )
    assert expected == {"rx": {"c1": "vz"}}  # family byte order wins

    for order in ([row_z, row_a], [row_a, row_z]):
        sink = EmulatedEsSink(spark, str(tmp_path / f"s{order[0][0]}"))
        for row in order:  # one epoch per mutation
            cells, dels = compact_epoch(spark.createDataFrame([row], cols))
            sink.apply(cells, dels)
        assert state_as_dict(sink.read_state()) == expected


def test_replicator_reads_through_configured_sink(spark, tmp_path):
    """A replicator started with sink_cls=BucketedStateSink must read its
    state back through the SAME layout (state()/cells() used to hardcode
    EmulatedEsSink and silently return empty)."""
    from hbase_observer_elasticsearch_spark.replicator import CdcReplicator
    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
    )

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=2)
    rep = CdcReplicator(
        spark, cf_dir, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    rep.start(
        sink_cls=BucketedStateSink,
        trigger={"availableNow": True},
        max_files_per_trigger=1,
    )
    rep.await_drained()
    rep.stop()
    assert state_as_dict(rep.state()) == EXPECTED_STATE
    assert rep.cells().filter("qualifier IS NULL").count() > 0  # tombstones


def test_bulk_action_line_escapes_rowkey(spark):
    """A rowkey containing quotes/backslashes must produce valid NDJSON on
    the action line (previously raw-concatenated into the JSON literal)."""
    import json

    from hbase_observer_elasticsearch_spark.sinks.bulk_format import bulk_lines

    state = spark.createDataFrame(
        [('k"quote', {"a": "1"}), ("k\\back", {"b": "2"}), ("plain", None)],
        "rowkey string, doc map<string,string>",
    )
    rows = {r["rowkey"]: r for r in bulk_lines(state, "idx").collect()}
    for key, r in rows.items():
        action = json.loads(r["action_json"])  # must parse
        verb = "delete" if r["doc_json"] is None else "update"
        assert action[verb]["_id"] == key
        assert action[verb]["_index"] == "idx"
        if r["doc_json"] is not None:
            json.loads(r["doc_json"])


def test_streaming_enrich_with_dim(spark, tmp_path):
    """Stream-static broadcast join: every changefeed record carries its
    dim attributes; keys missing from the dim survive with NULLs."""
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_enrich_with_dim,
    )

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=2)
    dim = spark.createDataFrame(
        [("r1", "tenant_a"), ("r2", "tenant_b")], "rowkey string, tenant string"
    )
    q = (
        streaming_enrich_with_dim(spark, cf_dir, dim)
        .writeStream.format("memory")
        .queryName("enriched_cf")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched_cf")
    batch = fixture_changefeed(spark).join(F.broadcast(dim), "rowkey", "left")
    assert got.count() == batch.count()
    tenants = {r["rowkey"]: r["tenant"] for r in got.collect()}
    assert tenants["r1"] == "tenant_a" and tenants["r5"] is None


def test_streaming_put_delete_interval_join(spark, tmp_path):
    """Stream-stream interval join finds exactly the puts a delete killed
    within the window — identical to the batch range-join twin."""
    from hbase_observer_elasticsearch_spark.streaming.pipeline import (
        streaming_put_delete_interval_join,
    )

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=2)
    q = (
        streaming_put_delete_interval_join(spark, cf_dir, within="5 minutes")
        .writeStream.format("memory")
        .queryName("pd_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["rowkey"], r["put_seq"]) for r in spark.table("pd_join").collect()
    }
    cf = fixture_changefeed(spark)
    puts = cf.filter("op = 'put'").select(
        "rowkey", F.col("ts").alias("put_ts"), F.col("seq").alias("put_seq")
    )
    dels = cf.filter("op = 'delete'").select(
        F.col("rowkey").alias("d_rowkey"), F.col("ts").alias("del_ts")
    )
    want = {
        (r["rowkey"], r["put_seq"])
        for r in puts.join(
            dels,
            F.expr(
                "rowkey = d_rowkey AND del_ts >= put_ts "
                "AND del_ts <= put_ts + INTERVAL 5 minutes"
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_bucketed_sink_crash_mid_epoch_is_atomic(spark, tmp_path):
    """A writer that dies BETWEEN bucket publishes must leave readers on
    the complete old epoch (the manifest is the commit point); replaying
    the epoch afterwards lands the complete new epoch."""
    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
    )

    class CrashingSink(BucketedStateSink):
        crashes_left = 0

        def _publish_bucket(self, src, dst):
            if self.crashes_left == 0:
                raise RuntimeError("injected crash between bucket publishes")
            self.crashes_left -= 1
            super()._publish_bucket(src, dst)

    sink = CrashingSink(spark, str(tmp_path / "bstate"), n_buckets=4)
    cf = fixture_changefeed(spark)

    # epoch 1 (clean): first half of the fixture
    sink.crashes_left = 10**9
    cells, dels = compact_epoch(cf.filter("seq < 7"))
    sink.apply(cells, dels)
    old_state = state_as_dict(sink.read_state())
    assert old_state  # non-empty baseline

    # epoch 2 crashes after ONE of several bucket publishes
    cells2, dels2 = compact_epoch(cf.filter("seq >= 7"))
    touched = (
        cells2.select(sink._bkt().alias("b"))
        .unionByName(dels2.select(sink._bkt().alias("b")))
        .distinct()
        .count()
    )
    assert touched > 1  # the crash window genuinely spans buckets
    sink.crashes_left = 1
    try:
        sink.apply(cells2, dels2)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    # readers see the complete OLD epoch — not a mix
    assert state_as_dict(sink.read_state()) == old_state

    # checkpoint replay of the epoch commits it fully
    sink.crashes_left = 10**9
    sink.apply(cells2, dels2)
    assert state_as_dict(sink.read_state()) == EXPECTED_STATE


def test_bucketed_sink_reads_pre_family_state(spark, tmp_path):
    """A state dir written before the family column existed must still be
    readable: read_cells null-fills the missing column instead of failing
    on a by-name select."""
    import json
    import os

    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
    )

    root = str(tmp_path / "bstate")
    sink = BucketedStateSink(spark, root, n_buckets=4)
    # hand-write a v=1 bucket WITHOUT the family column + a manifest
    old = spark.createDataFrame(
        [("r1", "c1", "v1", _ts(1), 1)],
        "rowkey string, qualifier string, value string, ts timestamp, seq long",
    )
    bkt = old.select(sink._bkt().alias("b")).collect()[0]["b"]
    old.coalesce(1).write.parquet(os.path.join(root, f"bkt={bkt}", "v=1"))
    with open(os.path.join(root, "_MANIFEST"), "w") as f:
        json.dump({"buckets": {str(bkt): 1}}, f)

    got = sink.read_cells().collect()
    assert [(r["rowkey"], r["qualifier"], r["value"], r["family"]) for r in got] == [
        ("r1", "c1", "v1", None)
    ]

    # and a subsequent epoch merges on top of the legacy version cleanly
    cells, dels = compact_epoch(
        spark.createDataFrame(
            [(2, "put", "r1", "info", "c2", "v2", _ts(2))],
            fixture_changefeed(spark).schema,
        )
    )
    sink.apply(cells, dels)
    assert state_as_dict(sink.read_state()) == {"r1": {"c1": "v1", "c2": "v2"}}


def test_bucketed_sink_second_live_writer_fails_loudly(spark, tmp_path):
    """Two sinks on one root must serialize or fail loudly: while writer A
    holds the per-root lease, writer B's apply raises ConcurrentWriterError
    instead of interleaving manifest swaps; after release, B proceeds."""
    import pytest as _pytest

    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        BucketedStateSink,
        ConcurrentWriterError,
    )

    root = str(tmp_path / "bstate")
    a = BucketedStateSink(spark, root, n_buckets=4)
    b = BucketedStateSink(spark, root, n_buckets=4)
    cells, dels = compact_epoch(fixture_changefeed(spark))

    a._acquire_lease()  # writer A mid-epoch
    with _pytest.raises(ConcurrentWriterError):
        b.apply(cells, dels)
    a._release_lease()

    b.apply(cells, dels)  # sequential writers serialize
    assert state_as_dict(b.read_state()) == EXPECTED_STATE


def test_bucketed_sink_stale_lease_stolen_and_gen_cas(spark, tmp_path):
    """A lease left by a crashed (dead-pid) writer is stolen and the epoch
    commits; the manifest generation CAS rejects a stale expected_gen, the
    defense-in-depth for lock-steal races."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from hbase_observer_elasticsearch_spark.sinks.bucketed_state_sink import (
        _WRITER_LOCK,
        BucketedStateSink,
        ConcurrentWriterError,
    )

    root = str(tmp_path / "bstate")
    sink = BucketedStateSink(spark, root, n_buckets=4)
    # pid above the kernel's default pid_max — guaranteed dead
    with open(_os.path.join(root, _WRITER_LOCK), "w") as f:
        _json.dump({"pid": 2**22 + 12345, "token": "crashed-writer"}, f)

    cells, dels = compact_epoch(fixture_changefeed(spark))
    sink.apply(cells, dels)  # steals the stale lease, commits, releases
    assert state_as_dict(sink.read_state()) == EXPECTED_STATE
    assert not _os.path.exists(_os.path.join(root, _WRITER_LOCK))
    assert sink._gen() == 1  # first commit bumped the generation

    with _pytest.raises(ConcurrentWriterError):
        sink._swap_manifest({}, expected_gen=0)  # moved under us


def test_tws_doc_state_parity(spark, tmp_path):
    """transformWithStateInPandas twin must converge to the same golden
    state as the applyInPandasWithState operator and the batch replay.
    Skips where the TWS protobuf dependency is absent (this container);
    the operator raises a clear NotImplementedError there instead of
    crashing the streaming runner at PRE_INIT."""
    import json

    import pytest

    from hbase_observer_elasticsearch_spark.streaming import stateful

    cf_dir = str(tmp_path / "cf")
    write_changefeed_stream_dir(fixture_changefeed(spark), cf_dir, n_files=3)
    if not stateful._HAS_TWS:
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful.stateful_doc_state_tws(spark, cf_dir)
        pytest.skip("transformWithStateInPandas protobuf dependency absent")

    q = (
        stateful.stateful_doc_state_tws(spark, cf_dir)
        .writeStream.format("memory")
        .queryName("tws_parity")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    last: dict = {}
    for r in spark.table("tws_parity").collect():
        if r["rowkey"] not in last or r["version"] > last[r["rowkey"]]["version"]:
            last[r["rowkey"]] = r
    got = {
        k: json.loads(v["doc_json"])
        for k, v in last.items()
        if json.loads(v["doc_json"])
    }
    assert got == EXPECTED_STATE


def test_session_window_merges_on_bridge_event(spark, tmp_path):
    """A late-but-in-watermark event that lands BETWEEN two existing
    sessions of the same key must MERGE them into one emitted session —
    the interval-state semantics that distinguish session windows from
    slot-shaped window state. File 1 creates two sessions of user 'a'
    (gap 40 min > the 30-min session gap); file 2 bridges them at +20 min
    and pushes the watermark far past their end with a distant key 'b'
    event, so exactly ONE merged session for 'a' is emitted in append
    mode."""
    import datetime as dt
    import os
    import uuid

    from pyspark.sql import functions as F

    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        CHANGEFEED_SCHEMA,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(seq, key, minutes):
        return (
            seq,
            "put",
            key,
            "info",
            "q",
            "v",
            t0 + dt.timedelta(minutes=minutes),
        )

    f1 = [row(1, "a", 0), row(2, "a", 40)]
    f2 = [row(3, "a", 20), row(4, "b", 600)]
    cf_dir = str(tmp_path / "cf")
    os.makedirs(cf_dir)
    for i, rows in enumerate((f1, f2), start=1):
        df = spark.createDataFrame(rows, CHANGEFEED_SCHEMA).coalesce(1)
        part = str(tmp_path / f"part{i}")
        df.write.mode("overwrite").parquet(part)
        import glob
        import shutil
        import time

        src = sorted(glob.glob(os.path.join(part, "*.parquet")))[0]
        dst = os.path.join(cf_dir, f"{i:05d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = (
        spark.readStream.schema(CHANGEFEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(cf_dir)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes"), "rowkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "rowkey",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n",
        )
    )
    name = "merge_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = {r["rowkey"]: r for r in spark.table(name).collect()}
    # user 'a': one MERGED session 00:00 → 00:40+30min, all 3 events
    assert "a" in out and out["a"]["n"] == 3
    assert out["a"]["s"] == t0
    assert out["a"]["e"] == t0 + dt.timedelta(minutes=70)
    # user 'b''s session is still open at the final watermark → absent
    assert "b" not in out
