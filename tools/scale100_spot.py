"""100x spot rehearsal for the three scale-anchor families (r9 verdict
directive #6): dedup verify, winnowing fingerprints, IVF-PQ.

The 10x rehearsal fits one decade of scaling; this measures a SECOND
decade (sf0.1 -> .scale10 -> .scale100 = 5k/50k/500k docs, 2k/20k/200k
vectors) and checks that the decade-1-fitted power law extrapolates:
predicted_100x = wall_1x * (wall_10x / wall_1x)^2 (log-linear), and
measured/predicted should sit near 1 for the linear families (pair
mass is also recorded so a super-linear wall can be attributed to real
duplicate mass rather than plan failure).

Protocol: solo process, memos cleared between scales, System.gc settle
before each measurement, best-of-2 for the cheap linear queries and a
single cold run for the memo builds (the cold build IS the number).

Writes SCALE100_SPOT.json; tools/scale_rehearsal.py embeds it as the
"hundred_x" section of SCALE_r10.json when present.

Usage: python tools/gen_scale100.py && python tools/scale100_spot.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_observer_elasticsearch_spark.memos import clear_memos  # noqa: E402
from hbase_observer_elasticsearch_spark.registry import queries  # noqa: E402
from hbase_observer_elasticsearch_spark.session import get_spark  # noqa: E402

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "10x": os.path.join(REPO, ".scale10"),
    "100x": os.path.join(REPO, ".scale100"),
}
# family -> (registered query, n timed draws). Memo-backed families get
# one cold draw (the build is the measurement); linear queries best-of-2.
FAMILIES = {
    "dedup_pair_mass_audit": ("dedup_pair_mass_audit", 2),
    "dedup_verify": ("dedup_ngram_jaccard", 1),
    "winnowing": ("text_winnowing_fingerprints", 2),
    "ivfpq": ("similarity_topk_ivfpq", 1),
}


def main() -> None:
    for name, d in SCALES.items():
        if not os.path.isdir(d):
            raise SystemExit(f"missing {name} fixture dir {d}")
    spark = get_spark("scale100_spot", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out: dict = {"scales": {k: {} for k in SCALES}}

    for scale, sf_dir in SCALES.items():
        clear_memos(spark)
        for fam, (qname, draws) in FAMILIES.items():
            spark.sparkContext._jvm.System.gc()
            walls = []
            for _ in range(draws):
                t0 = time.perf_counter()
                rows = qs[qname](spark, sf_dir).collect()
                walls.append(round(time.perf_counter() - t0, 3))
            rec: dict = {"wall_s": min(walls), "draws": walls, "rows": len(rows)}
            if fam == "dedup_pair_mass_audit":
                rec["pair_mass"] = sum(r["pair_mass"] for r in rows)
                rec["capped_pair_mass"] = sum(
                    r["capped_pair_mass"] for r in rows
                )
            out["scales"][scale][fam] = rec
            print(f"{scale:>5} {fam:<22} {rec}", flush=True)

    fams = {}
    for fam in FAMILIES:
        w1 = out["scales"]["1x"][fam]["wall_s"]
        w10 = out["scales"]["10x"][fam]["wall_s"]
        w100 = out["scales"]["100x"][fam]["wall_s"]
        exp = math.log10(max(w10, 1e-3) / max(w1, 1e-3))
        pred = w1 * (w10 / w1) ** 2 if w1 > 0 else None
        fams[fam] = {
            "wall_1x": w1,
            "wall_10x": w10,
            "wall_100x": w100,
            "fitted_exponent": exp and round(exp, 3),
            "predicted_100x": round(pred, 3),
            "measured_over_predicted": round(w100 / pred, 3) if pred else None,
            # The log-linear fit UNDER-predicts any family whose decade-1
            # wall is fixed-overhead-dominated (small absolute seconds),
            # so also record the decade-2 growth against the family's
            # DESIGN law: every anchor here is O(n) or O(n^1.5), so the
            # 10x->100x wall ratio must stay under 10^1.5 ~= 31.6.
            "decade2_ratio": round(w100 / max(w10, 1e-3), 2),
            "within_design_n15": w100 / max(w10, 1e-3) <= 10**1.5,
        }
    out["extrapolation"] = fams
    with open(os.path.join(REPO, "SCALE100_SPOT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(fams, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
