"""One-off deep-tier spot check (VERDICT r14 stretch item 7): the 10x
smoke's linear-bound claim was extrapolated from a single decade, so
this tool re-measures ONLY the suite's worst five entries (the two
shared builds, pagerank, column profile, corpus pipeline) at the
deepest tier make_scale_tier can synthesize (25 copies — the generator
caps at 26 to keep every copy's text/embedding transform non-identity)
and records whether the data-linear bound still holds beyond 10x.

Methodology matches tools/scale_smoke.py: one session, warm_session
first, sf0.1 baseline then the deep tier, noop sink, builds timed as
explicit entries through the session memo (cold, once per tier). The
gate form is the smoke's absolute one: big > 2*copies * max(base, 0.5)
fails. Writes SCALE_SPOT_25X.json at the repo root.

Run:  python tools/make_scale_tier.py --out /tmp/scale25 --copies 25
      python tools/scale_spot.py [--tier /tmp/scale25] [--copies 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SPOT = [
    "q117588_pagerank",
    "z139190_column_profile",
    "z12790_corpus_pipeline",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--tier", default="/tmp/scale25")
    ap.add_argument("--copies", type=int, default=25)
    ap.add_argument(
        "--out", default=os.path.join(_ROOT, "SCALE_SPOT_25X.json")
    )
    args = ap.parse_args()

    # Shared with the 10x smoke (code-review r15: duplicated gate logic
    # drifts) — one manifest check, one gate predicate for both tools.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_smoke import gate_exceeds, load_tier_manifest, run_tier

    manifest = load_tier_manifest(args.tier, args.copies)

    from eprints_to_hyku_data_tool_spark.session import get_spark, warm_session

    spark = get_spark(
        app_name="scale-spot",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory="64g",
    )
    warm_session(spark, args.base)
    print(f"tier sf0.1: {args.base}", flush=True)
    base = run_tier(spark, args.base, names=SPOT, with_grams_build=False)
    print(f"tier {args.copies}x: {args.tier}", flush=True)
    big = run_tier(spark, args.tier, names=SPOT, with_grams_build=False)
    spark.stop()

    linear_bound = 2.0 * args.copies
    rows, failures = {}, []
    for name in base:
        rows[name] = {
            "sf01_sec": round(base[name], 3),
            "deep_sec": round(big[name], 3),
            "ratio": round(big[name] / max(base[name], 1e-9), 2),
        }
        if gate_exceeds(big[name], base[name], linear_bound):
            failures.append(name)
    report = {
        "copies": args.copies,
        "linear_bound": linear_bound,
        "tier_manifest": {
            "copies": manifest["copies"],
            "rows": manifest["rows"],
        },
        "entries": rows,
        "failures": failures,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["ratio"] for k, v in rows.items()}, indent=1))
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()
