"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is materialized with the noop sink (full execution, no
output-format cost). The headline metric is total wall-seconds across the
registered query set PLUS the named memo_build_* rows, which charge each
memoized family's cold build (dedup pair tables, CC labels, ANN top-k
tables, the drained-changefeed fixture dir) explicitly instead of hiding
it in whichever query touches the memo first (r5 verdict directive #2) —
per-query numbers are then honest warm incremental costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_observer_elasticsearch_spark.registry import queries  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def load_prior(
    repo: str, sf: str, current_names: set[str] | None = None
) -> tuple[str, dict] | None:
    """Newest committed per-query map at the same sf, for the delta line
    and the in-loop regression escalation. BENCH_PREV.json is the
    committed snapshot of the previous round's official full map, then
    the last bench_out.json; the driver's BENCH_r{N}.json wrappers only
    parse the slowest-10 tail line, so they are the final fallback
    (sorted by parsed round number — lexicographic order would put r9
    after r10 from round 10 on). A candidate that shares no query names
    with the current registry (e.g. after a rename sweep) is skipped so
    the delta falls through to an older comparable prior instead of
    silently becoming null and disabling looks_regressed escalation."""
    import re

    def _round_no(fname: str) -> int:
        m = re.search(r"BENCH_r(\d+)", fname)
        return int(m.group(1)) if m else -1

    prior_files = ["BENCH_PREV.json", "bench_out.json"] + sorted(
        (
            f for f in os.listdir(repo)
            if f.startswith("BENCH_r") and f.endswith(".json")
        ),
        key=_round_no,
        reverse=True,
    )
    for fname in prior_files:
        try:
            with open(os.path.join(repo, fname)) as f:
                prior = json.load(f)
            parsed = prior.get("parsed") or prior  # driver wrapper or raw
            if float(parsed.get("sf", -1)) != float(sf):
                continue
            prev_q = parsed.get("queries") or {}
            if current_names is not None and not (
                set(prev_q) & current_names
            ):
                continue
            if prev_q:
                return fname, prev_q, parsed
        except Exception:  # noqa: BLE001 — malformed artifact never kills bench
            continue
    return None


def run_probe(spark) -> float:
    """ONE draw of the fixed pure-JVM host-throughput probe: xxhash64
    over 8e9 ids, 32 partitions — no IO, no Python, no shuffle. Sized to
    ~2-3 s of work (r11 verdict directive #2: the old 0.1-0.2 s probe's
    own spread was 2.15x within one run, too light to bear the
    net-of-probe conclusions drawn from it; a multi-second draw
    amortizes task-launch jitter so the draw measures sustained JVM
    throughput). Callers take >=5 draws spread across the bench run and
    quote the median + spread, never a single draw."""
    import pyspark.sql.functions as _F

    t0 = time.perf_counter()
    spark.range(0, 8_000_000_000, 1, 32).select(
        _F.sum(_F.xxhash64("id") % 1000)
    ).collect()
    return round(time.perf_counter() - t0, 3)


def memo_build_rows(spark, sf_dir: str, per_query: dict) -> None:
    """Charge each memo family's cold build to a named memo_build_* row
    (r5 verdict directive #2): the per-(app, sf_dir) localCheckpoint
    memos (dedup pair tables, CC labels, ANN top-k tables, the shared
    drained-changefeed fixture dir) amortize shared subtrees across the
    query loop — the materialized-view idiom — but without these rows
    the warm per-query numbers hid the build cost entirely (e.g.
    similarity_topk_pq read 0.026 s warm vs ~14 s cold in SCALE_r5).
    Build rows are timed cold, included in the headline total, and every
    registered query then measures its honest warm incremental cost.
    Ordering matters: CC labels read the verified-pairs memo, the RHP
    top-k reads the scored-candidate memo — so each row isolates one
    build stage."""
    from hbase_observer_elasticsearch_spark.operators import dedup as _dd
    from hbase_observer_elasticsearch_spark.operators import (
        similarity as _sim,
    )
    from hbase_observer_elasticsearch_spark.operators import text as _txt
    from hbase_observer_elasticsearch_spark.sources.changefeed import (
        shared_changefeed_stream_dir,
    )

    builds = [
        # r13 optimization round: the corpus shingle pass (explode + md5
        # per shingle) is now memoized once per (app, sf_dir) — it was
        # recomputed by 13 queries (and twice inside diamond plans);
        # charge its cold build first so the verified-pairs/LSH rows
        # below measure their own incremental work.
        ("memo_build_dedup_shingles", _dd._shingles_memo),
        ("memo_build_dedup_verified_pairs", _dd._verified_pairs_memo),
        ("memo_build_dedup_lsh_candidates", _dd._lsh_cand_memo),
        ("memo_build_dedup_cc_labels", _dd._jaccard_cc_labels),
        ("memo_build_similarity_topk_bf", _sim.similarity_topk_bruteforce),
        ("memo_build_similarity_rhp_scored", _sim._rhp_scored),
        ("memo_build_similarity_topk_rhp", _sim.similarity_topk_rhp),
        ("memo_build_similarity_topk_pq", _sim.similarity_topk_pq),
        # renamed from memo_build_similarity_topk_ivfpq in r8 (r7 advice):
        # the shared 'ivfpq' memo has materialized the 3x wider ADC pool
        # (rk <= IVFPQ_POOL = 30, feeding both top-k and the exact
        # re-rank) since 40e4beb — the new name marks the semantic change
        # so cross-round deltas aren't misread as regression.
        ("memo_build_similarity_ivfpq_pool", _sim.similarity_topk_ivfpq),
        # one corpus-pass inverted-index build shared by the whole
        # lexical-retrieval family (BM25/PRF/champion/MLT/fuzzy/
        # rank_feature/dis_max) — r11
        ("memo_build_text_postings", _txt._postings_memo),
        # r13: index-time doc-length + corpus stats, shared by the whole
        # BM25 family (each query previously re-aggregated dl twice).
        ("memo_build_text_dl_stats", _txt._dl_stats_memo),
        (
            "memo_build_changefeed_dir",
            lambda s, d: shared_changefeed_stream_dir(s, d, n_files=2),
        ),
    ]
    for name, fn in builds:
        t0 = time.perf_counter()
        fn(spark, sf_dir)  # localCheckpoint inside the memo is eager
        per_query[name] = round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = queries()
    # Warmup (not timed): flagship query for JIT/JVM, one scan per table for
    # file-index/footer caches, and a trivial mapInPandas to fork the Python
    # worker pool — so per-query numbers measure execution, not cold-start.
    materialize(qs["cdc_last_state"](spark, sf_dir))
    from hbase_observer_elasticsearch_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    region = load_table(spark, sf_dir, "region")
    region.mapInPandas(lambda it: it, schema=region.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    # Host-throughput probe (r8; hardened r9 per verdict #5): the fixed
    # pure-JVM job timed best-of-3 at bench START, MIDPOINT, and END —
    # the probe itself swings >2x within one boot (r8 builder runs:
    # 0.251/0.288/0.443; judge same boot: 0.709), so a single sample is
    # too noisy to normalize with. Cross-boot absolute walls drift
    # 1.3-2.6x (code-unchanged pure-JVM queries measured at 2.6x across
    # boots on an idle machine, zero steal, nominal MHz). The delta block
    # reports BOTH the raw cross-round ratio and the net-of-probe ratio;
    # neither is quoted without the other. r12: >=5 draws (start, three
    # in-loop quartile points, end), each a single ~2-3 s fixed job; an
    # untimed light warm-up first so the start draw doesn't carry
    # first-job JIT/codegen cost.
    run_probe(spark)  # untimed full-size warm-up: the first draw of the
    # job pays JIT/codegen (measured 2.9 s vs 1.8 s steady) and would
    # otherwise inflate the start draw and the spread.
    probe_draws: dict[str, float] = {"start": run_probe(spark)}

    # best-of-2 per query, escalating to best-of-3 when the two samples
    # disagree by >30% — r3→r4 diagnosis of the flagged "regressions"
    # (dedup_simhash, q21_waiting_supplier, join_asof — all code-unchanged
    # since r2) found they are stage-overhead-dominated at this SF and
    # carry ±1s run-to-run JVM noise (quiet-machine solo samples for
    # 2026-08-14 follow-up: a BROAD uniform inflation of the common
    # subset (+25% across code-unchanged queries, e.g. q1 0.72→1.22s
    # MINIMUM of solo best-of-3) tracks sustained host load, not any
    # query: solo best-of-3 on an otherwise idle session reproduces the
    # inflation, so per-query deltas only mean something when the
    # whole-run baseline ratio is ~1. Compare the common-subset TOTAL
    # first; read per-query regressions only net of that ratio.
    # r5 follow-up (2026-08-14): the shift is CROSS-BOOT, not just
    # cross-load — on a verified-idle machine (0 leftover JVMs, load
    # <2), solo best-of-3 of queries untouched since r2 ran uniformly
    # 30-60% above their r4-recorded times (agg_cube 1.0->1.29,
    # join_range_binned 0.36->0.64, q9 0.58->0.89), while queries
    # optimized THIS round improved against the same baseline
    # (streaming twins 28.6s->~21s). Absolute per-query times are only
    # comparable within one boot; across rounds, read the ratio of the
    # common-subset total and the direction of same-boot A/B deltas.
    # dedup_simhash: 2.4/2.0/3.2/1.9s; a 13.9s GC outlier observed once),
    # so single unlucky draws masqueraded as regressions. The System.gc()
    # settle drains cross-query allocation debt so query N doesn't pay
    # query N-1's collection.
    repo = os.path.dirname(os.path.abspath(__file__))
    prior = load_prior(repo, sf, current_names=set(qs))
    prev_q: dict = prior[1] if prior else {}

    per_query: dict[str, float] = {}
    noisy: list[str] = []
    jvm_system = spark._jvm.System  # noqa: SLF001 — JVM GC hook
    memo_build_rows(spark, sf_dir, per_query)
    names_sorted = sorted(qs)
    # Dedupe quartile indices (r12 advice, low): at n<4 the three
    # indices collapse onto the same key and the dict silently dropped
    # draws; keep the first label per distinct index so a filtered run
    # still reports however many in-loop draws its size supports.
    quartiles: dict[int, str] = {}
    for idx, label in (
        (len(names_sorted) // 4, "q1"),
        (len(names_sorted) // 2, "mid"),
        ((3 * len(names_sorted)) // 4, "q3"),
    ):
        quartiles.setdefault(idx, label)
    for qi, name in enumerate(names_sorted):
        if qi in quartiles:
            probe_draws[quartiles[qi]] = run_probe(spark)
        jvm_system.gc()
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        # Escalate best-of-2 -> best-of-3 when the two samples disagree
        # by >30%, OR when the best-of-2 would be recorded as a
        # regression vs the prior snapshot (r5 verdict directive #6:
        # agg_case_bucketing regressed 0.38->1.32 s code-unchanged and
        # the sample-disagreement trigger alone missed it — a
        # would-be-regression is exactly the case worth one more draw
        # before it lands in the committed artifact).
        looks_regressed = name in prev_q and min(times) > prev_q[name] + max(
            0.3, 0.3 * prev_q[name]
        )
        if (
            min(times) > 0.15
            and abs(times[0] - times[1]) > 0.3 * min(times)
        ) or looks_regressed:
            noisy.append(name)
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        per_query[name] = round(min(times), 3)

    total = round(sum(per_query.values()), 3)
    probe_draws["end"] = run_probe(spark)
    probes = sorted(probe_draws.values())
    host_probe_s = {
        **probe_draws,
        "min": round(probes[0], 3),
        "median": round(probes[len(probes) // 2], 3),
        "max": round(probes[-1], 3),
        # spread = max/min across the >=5 draws: >~1.3 marks a run that
        # straddled a load window — discard and rerun before comparing.
        "spread": round(probes[-1] / max(probes[0], 1e-9), 2),
    }

    # Bound memo lifetime (r4 verdict directive #7): the per-(app, sf_dir)
    # localCheckpoint memos and /dev/shm changefeed dirs served their
    # purpose during the loop; release them so a long-lived process (or a
    # multi-sf bench) doesn't pin block-manager storage indefinitely.
    from hbase_observer_elasticsearch_spark.memos import clear_memos

    clear_memos(spark)

    # Common-subset delta vs the newest committed BENCH_r{N}.json at the
    # same sf, so round-over-round regressions are visible in the driver
    # artifact itself (r2 verdict #8).
    delta = None
    if prior is not None:
        fname, prev_q, prev_parsed = prior
        common = [k for k in prev_q if k in per_query]
        if common:
            # When the prior snapshot predates the memo_build_* rows, its
            # memo-consuming entries were cold while ours are warm: the
            # common-subset delta then overstates improvement and the
            # regressed tripwire can't fire for those families (warm never
            # regresses vs cold). Flag that one-round comparability gap.
            warm_vs_cold_prior = any(
                k.startswith("memo_build_") for k in per_query
            ) and not any(k.startswith("memo_build_") for k in prev_q)
            delta = {
                "vs": fname,
                "n_common": len(common),
                "prev_sec": round(sum(prev_q[k] for k in common), 2),
                "now_sec": round(sum(per_query[k] for k in common), 2),
                "regressed": {
                    k: [round(prev_q[k], 2), round(per_query[k], 2)]
                    for k in common
                    if per_query[k] > prev_q[k] + max(0.3, 0.3 * prev_q[k])
                },
            }
            if warm_vs_cold_prior:
                delta["warm_vs_cold_prior"] = True
            # Raw AND net-of-probe cross-round ratios, always together
            # (r8 verdict #5: one-sided probe normalization misled both
            # directions; net means nothing without raw beside it).
            prev_total = sum(prev_q[k] for k in common)
            if prev_total > 0:
                delta["raw_ratio"] = round(
                    sum(per_query[k] for k in common) / prev_total, 3
                )
                pp = prev_parsed.get("host_probe_s")
                prev_probe = (
                    pp.get("median") if isinstance(pp, dict) else pp
                )
                if prev_probe:
                    delta["probe_prev"] = prev_probe
                    delta["probe_now_median"] = host_probe_s["median"]
                    delta["net_of_probe_ratio"] = round(
                        delta["raw_ratio"]
                        / (host_probe_s["median"] / prev_probe),
                        3,
                    )
                    # r12 probe redesign (~0.15 s triad -> ~1.8 s 5-draw):
                    # a prev map carrying the OLD light probe makes the
                    # net ratio meaningless across the transition — flag
                    # it so nobody reads 0.07x as a real speedup.
                    if prev_probe < 1.0 <= host_probe_s["median"]:
                        delta["probe_methodology_changed"] = True

    full = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf),
        "host_probe_s": host_probe_s,
        "delta": delta,
        "noisy_reruns": noisy,
    }
    # Full detail to a file (r1's single long stdout line was tail-truncated
    # by the capture — BENCH_r01.json recorded parsed: null).
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    # TEARDOWN BEFORE PRINTING (r12 verdict directive #1): BENCH_r12
    # recorded parsed:null because a StateStore maintenance-thread WARN
    # stacktrace landed on stdout AFTER the summary JSON line. Stop the
    # SparkSession first — killing the state-store maintenance threads —
    # then flush, so the summary JSON is the true last thing on stdout.
    spark.stop()
    sys.stdout.flush()
    sys.stderr.flush()
    # stdout: the full object first (for line-scanning parsers), then a
    # SHORT final line that survives tail-capture intact — headline total
    # plus the slowest queries at 2-decimal precision.
    print(json.dumps(full, separators=(",", ":")))
    slowest = dict(
        sorted(per_query.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": len(per_query),
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                # the probe rides the SHORT line too, so the driver's
                # BENCH_r{N}.json carries it and next round's
                # net-of-probe ratio comes from committed artifacts
                # alone (r10 verdict directive #4).
                "host_probe_s": host_probe_s,
                "delta": delta,
                "queries_full": "bench_out.json",
            },
            separators=(",", ":"),
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
