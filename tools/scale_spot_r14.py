"""r14 scale spot bench (r13 verdict "Next round" item 5): make the
scale-sensitive rewrites MEASURABLE — sf0.1 wall time cannot show them
(the whole suite is overhead-bound there; 8 cores beat 32 on the full
r13 bench). This runs the rewritten queries at 1x (sf0.1) and 10x
(.scale10: 50k docs / 20k vectors / 6M lineitem rows) at BOTH 32 and 8
cores, in solo child processes (local[N] is per-JVM), and records:

- decade ratio (10x wall / 1x wall) per query at 32 cores — judged
  against each family's design law (linear token/row-grain passes and
  the n^1.5 pair/codebook anchors);
- core ratio (8-core wall / 32-core wall) at 10x — a compute-bound
  query should move toward 4x as data grows; overhead-bound rows sit
  at ~1 (the r13 verdict's scaling-block finding).

Fixtures: documents/embeddings/events from tools/gen_scale10.py
(deterministic, seed 42); lineitem is replicated 10x from sf0.1 with
per-copy l_orderkey shifts (keeps the (shipdate, orderkey, linenumber)
sort unique and value distributions intact — a timing fixture, not an
oracle fixture).

Writes SCALE_SPOT_r14.json. Usage: python tools/scale_spot_r14.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE10 = os.path.join(REPO, ".scale10")
SF01 = "/root/testdata/sf0.1"


def ensure_scale10() -> None:
    docs = os.path.join(SCALE10, "documents.parquet")
    if not os.path.exists(docs):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_scale10.py")],
            check=True,
        )
    # 10x fact tables: replicate sf0.1 with per-copy key shifts (keeps
    # value distributions and sort-uniqueness; a timing fixture, not an
    # oracle fixture). lineitem feeds the layout queries, orders feeds
    # sample_poisson_bootstrap_ci.
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        dst = os.path.join(SCALE10, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        src = pq.read_table(os.path.join(SF01, f"{table}.parquet"))
        shift = (
            int(src[key].combine_chunks().to_numpy().max()) + 1
            if len(src[key])
            else 1
        )
        copies = []
        for i in range(10):
            t = src
            if i:
                t = t.set_column(
                    t.schema.get_field_index(key),
                    key,
                    pc.add(t[key], i * shift),
                )
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst, row_group_size=200_000)
        print(f"wrote {dst}: {out.num_rows} rows")


def run_child(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scale_spot_r14_child.py"),
            sf_dir,
        ],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ensure_scale10()
    runs = {}
    for label, sf_dir, cpus in (
        ("1x_c32", SF01, 32),
        ("10x_c32", SCALE10, 32),
        ("10x_c8", SCALE10, 8),
        ("1x_c8", SF01, 8),
    ):
        print(f"running {label} ...", flush=True)
        runs[label] = run_child(sf_dir, cpus)
        print(json.dumps(runs[label]["rows"]), flush=True)

    names = sorted(runs["1x_c32"]["rows"])
    summary = {}
    for n in names:
        r = {k: runs[k]["rows"].get(n) for k in runs}
        decade = (
            round(r["10x_c32"] / r["1x_c32"], 2)
            if r["1x_c32"] and r["10x_c32"]
            else None
        )
        core_10x = (
            round(r["10x_c8"] / r["10x_c32"], 2)
            if r["10x_c32"] and r["10x_c8"]
            else None
        )
        core_1x = (
            round(r["1x_c8"] / r["1x_c32"], 2)
            if r["1x_c32"] and r["1x_c8"]
            else None
        )
        summary[n] = {
            **{k: v for k, v in r.items()},
            "decade_ratio_c32": decade,
            "core_ratio_10x": core_10x,
            "core_ratio_1x": core_1x,
        }
    out = {
        "methodology": (
            "solo child process per (scale, cpus); memo builds timed cold "
            "as their own rows; queries warm best-of-2 with gc settle, "
            "noop sink; 10x fixture = gen_scale10 docs/embeddings/events "
            "+ lineitem replicated 10x with orderkey shifts"
        ),
        "summary": summary,
    }
    with open(os.path.join(REPO, "SCALE_SPOT_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALE_SPOT_r14.json")


if __name__ == "__main__":
    main()
