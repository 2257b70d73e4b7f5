"""Measure the RP-LSH scaling exponent (VERDICT r8 item 6).

The q74 docstring (pre-round-9) claimed the LSH candidate-pair term
grows ~ n^1.66 at tau=0.4 (rho = ln(1/p1)/ln(1/p2) ~ 0.66). That was
analysis; this tool turns it into measurement — and the measurement
REFUTED the label as stated (see RPLSH_EXPONENT.json + BASELINE.md):
with FIXED 16x8 banding a random pair collides in >=1 band with
probability ~16/2^8 = 6.25%, so the candidate stream is a constant
~6-7% of ALL pairs at every scale — exponent 2.0 with a ~16x constant
cutdown. The n^(1+rho) = n^1.66 total-work curve is what maintaining
recall costs when band bits grow ~log n AND band count grows ~n^rho;
a fixed config is the quadratic-with-small-constant regime of that
family. This tool runs q74 at the 1x (sf0.1), 3x, and 10x key-shifted
tiers (tools/make_scale_tier.py) and fits two log-log slopes:

- candidate exponent: exact candidate-pair count per tier
  (sum over (band, sig) buckets of C(cnt, 2) minus the same-vector
  band collisions counted pairwise) vs n. This is the n^1.66 claim
  itself, measured with zero timing noise.
- runtime exponent: warm min-of-N wall time of the full q74 plan vs n.
  Expected BELOW the candidate exponent at these sizes: the plan also
  carries O(n) scan/signature work and a fixed ~1 s session floor, so
  the quadratic-ish verify term only dominates asymptotically. The
  candidate slope is the contract; the runtime slope is the sanity
  bound (must stay well under 2.0 and near-or-below the candidate
  slope once the floor is subtracted).

Method notes (the repo's bench lessons): ONE session, tiers smallest
first (JVM/JIT warm by the big tiers), one untimed warmup per tier,
then min of --runs timed runs. Run nothing else concurrently.

Run:  python tools/rplsh_exponent.py \
        [--tiers /root/testdata/sf0.1 /tmp/scale3 /tmp/scale10] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _fit_slope(xs: list[float], ys: list[float]) -> float:
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    return sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / sum(
        (a - mx) ** 2 for a in lx
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--tiers",
        nargs="+",
        default=["/root/testdata/sf0.1", "/tmp/scale3", "/tmp/scale10"],
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(_ROOT, "RPLSH_EXPONENT.json"))
    ap.add_argument(
        "--recall",
        action="store_true",
        help="also brute-force the exact tau-pair count per tier "
        "(driver-side numpy over the collected corpus — tool-only, "
        "fine at smoke tiers) and record recall = q74 pairs / exact",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.plans.q_embed import (
        _rp_signatures,
        derive_banding,
    )
    from eprints_to_hyku_data_tool_spark.session import get_spark
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    import __spark_entry__ as entry_mod

    q74 = entry_mod.queries()["z13974_rplsh_neardup"]

    spark = get_spark(
        app_name="rplsh-exponent",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory="48g",
    )

    def _cand_counts(sigs):
        per_band = (
            sigs.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.sum(F.expr("c * (c - 1) / 2")).alias("p"))
            .collect()[0]["p"]
        )
        distinct_pairs = (
            sigs.alias("a")
            .join(
                sigs.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select("a.vec_id", "b.vec_id")
            .distinct()
            .count()
        )
        return int(per_band), distinct_pairs

    rows = []
    for tier in args.tiers:
        n = load_table(spark, tier, "embeddings").count()

        # Exact candidate-pair count: pairs sharing >=1 band signature,
        # counted once per (band, sig) bucket then deduped across bands
        # is what q74 verifies; the raw per-band sum is the work the
        # verify stage actually performs (a pair colliding in b bands is
        # dotted b times pre-dedup in the oracle formulation, once per
        # group in the bucket-local plan), so report BOTH.
        sigs = _rp_signatures(load_table(spark, tier, "embeddings"))
        per_band, distinct_pairs = _cand_counts(sigs)

        # Same counts under the SIZE-DRIVEN banding (round 10): at the
        # anchor tiers this is the identical config; past the anchor
        # the derived rate must fall BELOW the fixed-config 6.85%
        # floor — the r9 verdict's acceptance criterion for making the
        # n^(1+rho) claim honestly.
        d_bands, d_bits = derive_banding(n)
        d_sigs = _rp_signatures(
            load_table(spark, tier, "embeddings"), d_bands, d_bits
        )
        d_per_band, d_distinct = _cand_counts(d_sigs)

        recall = None
        if args.recall:
            # Exact tau-pair count over the SAME micro-quantized cosine
            # q74 uses (floor(x*1e6+0.5) components), blocked numpy on
            # the driver — this is measurement tooling, not a plan, so
            # a bounded collect at smoke tiers is fine.
            import numpy as np

            pdf = (
                load_table(spark, tier, "embeddings")
                .select("vec_id", "embedding")
                .toPandas()
            )
            # Sort by vec_id so positional order == id order: the
            # below-diagonal block skip assumes pairs in skipped blocks
            # have ids[i] > ids[j]; on an unsorted scan, inverted
            # cross-block pairs would be silently dropped, undercounting
            # exact_tau_pairs (code review r10).
            pdf = pdf.sort_values("vec_id", ignore_index=True)
            ids = pdf["vec_id"].to_numpy()
            vq = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * 1e6
                + 0.5
            )
            nrm = np.sqrt((vq * vq).sum(1))
            exact = 0
            B = 4096
            for i0 in range(0, len(ids), B):
                for j0 in range(0, len(ids), B):
                    if j0 + B <= i0:
                        continue
                    cos = (vq[i0 : i0 + B] @ vq[j0 : j0 + B].T) / np.outer(
                        nrm[i0 : i0 + B], nrm[j0 : j0 + B]
                    )
                    ii, jj = np.nonzero(cos >= 0.4)
                    exact += int((ids[i0 + ii] < ids[j0 + jj]).sum())
            found = q74(spark, tier).count()
            recall = {
                "exact_tau_pairs": exact,
                "lsh_found_pairs": found,
                "recall": round(found / max(exact, 1), 3),
            }

        q74(spark, tier).write.format("noop").mode("overwrite").save()  # warmup
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q74(spark, tier).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        all_pairs = n * (n - 1) / 2
        rows.append(
            {
                "tier": tier,
                "n": n,
                "cand_per_band": int(per_band),
                "cand_distinct": distinct_pairs,
                # the key diagnostic: a scale-constant rate means the
                # candidate stream is a fixed fraction of ALL pairs
                # (quadratic with a constant cutdown), not sub-quadratic
                "cand_rate_of_all_pairs": round(distinct_pairs / all_pairs, 4),
                "derived_config": f"{d_bands}x{d_bits}",
                "derived_cand_per_band": d_per_band,
                "derived_cand_distinct": d_distinct,
                "derived_cand_rate": round(d_distinct / all_pairs, 4),
                "sec_min": round(min(times), 3),
                "sec_all": [round(t, 3) for t in times],
            }
        )
        if recall is not None:
            rows[-1]["derived_recall"] = recall
        print(json.dumps(rows[-1]), flush=True)
    spark.stop()

    ns = [r["n"] for r in rows]
    report = {
        "banding": (
            "fixed = 16 bands x 8 bits; derived = derive_banding(n) "
            "(anchor 2048, bits 8+e, bands [16,26,41]<<2*(e//3)), "
            "tau=0.4"
        ),
        "claimed_exponent": 1.66,
        "candidate_exponent_per_band": round(
            _fit_slope(ns, [r["cand_per_band"] for r in rows]), 3
        ),
        "candidate_exponent_distinct": round(
            _fit_slope(ns, [r["cand_distinct"] for r in rows]), 3
        ),
        "derived_candidate_exponent_distinct": round(
            _fit_slope(ns, [r["derived_cand_distinct"] for r in rows]), 3
        ),
        # the r9 verdict's acceptance bar: past the anchor, the derived
        # config's candidate rate must drop below the fixed config's
        # scale-constant ~6.85% floor. None (not True) when NO tier
        # exceeds the anchor — a vacuous all() over zero tiers would
        # record the bar as passed without ever measuring it.
        "derived_rate_below_fixed_floor": (
            all(
                r["derived_cand_rate"] < 0.0683
                for r in rows
                if r["n"] > 2048
            )
            if any(r["n"] > 2048 for r in rows)
            else None
        ),
        "runtime_exponent": round(
            _fit_slope(ns, [r["sec_min"] for r in rows]), 3
        ),
        "tiers": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
