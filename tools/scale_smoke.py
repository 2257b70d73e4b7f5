"""Scale smoke above sf0.1 (VERDICT r6 item 4): run the heaviest
registered queries plus both shared `_build_*` pipelines at the ~10x
tier synthesized by tools/make_scale_tier.py, against their sf0.1
timings measured in the SAME process, and record per-query scaling
ratios. The point is not throughput bragging — it is catching
fits-in-memory constants (LSH band widths, IVF sample sizes, adjacency
basket sizes) that the fixture tiers are too small to break: a query
whose runtime scales worse than ~2x data-linear (ratio > copies * 2)
fails the smoke.

Method notes:
- Both tiers run in ONE session, sf0.1 FIRST (warms the JVM so the 10x
  numbers are not inflated by first-touch), each query one timed run.
- The session memo keys on sf_dir, so the shared graph/pair builds are
  measured once per tier as explicit `_build_*` entries (the queries
  then pay marginals, mirroring bench.py's accounting).
- Writes SCALE_SMOKE.json at the repo root; does NOT touch
  BENCH_local.json (the sf0.1 regression sidecar).

Run:  python tools/scale_smoke.py [--tier /tmp/scale10] [--copies 10]
      (generate the tier first with tools/make_scale_tier.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# Heaviest registered queries by the round-6 artifact of record
# (BENCH_r06.json worst list, mapped through RENAMES_r7) — the 15-20
# names whose constants are most likely to be scale-sensitive, spanning
# every heavy family: graph, winnowing, n-gram filters, LSH (all three
# forms), decontamination, IVF, corpus pipeline, profiling, percentile
# sketches, PPJoin leakage, k-means, BPE.
HEAVY = [
    "q117588_pagerank",
    "z117526_bfs_hops",
    "q10620_global_agg",
    "z10658_winnow_containment",
    "q128301_duplicate_ngram_filter",
    "z13974_rplsh_neardup",
    "q11775_decontaminate",
    "z139185_ivf_topk",
    "z12790_corpus_pipeline",
    "z139190_column_profile",
    "z117192_approx_percentile",
    "q9345_split_leakage",
    "q10554_association_rules",
    "z10660_simhash",
    "z11660_minhash_lsh",
    "q10622_approx_count_distinct",
    "q9341_kmeans_lloyd",
    "z11556_bpe_encode",
]


def load_tier_manifest(tier: str, copies: int) -> dict:
    """Load and validate the tier's manifest (shared with
    tools/scale_spot.py so the two gates cannot drift): the linear
    bound is derived from --copies, so --copies must equal the copy
    count the tier was ACTUALLY built with — a stale tier from a
    smaller experiment would make the bound vacuous (code-review r15).
    make_scale_tier.py writes the manifest."""
    manifest_path = os.path.join(tier, "tier_manifest.json")
    if not os.path.exists(manifest_path):
        raise SystemExit(
            f"no tier_manifest.json in {tier} — regenerate the tier "
            "with tools/make_scale_tier.py (it records the copy count "
            "the gate bound depends on)"
        )
    manifest = json.load(open(manifest_path))
    if manifest["copies"] != copies:
        raise SystemExit(
            f"tier at {tier} was built with copies="
            f"{manifest['copies']} but the smoke was invoked with "
            f"--copies {copies}; the linear bound would be wrong — "
            "regenerate the tier or fix the flag"
        )
    return manifest


def gate_exceeds(big_s: float, base_s: float, bound: float) -> bool:
    """The absolute-form gate predicate (code-review r15, shared with
    tools/scale_spot.py): sub-half-second baselines are judged AS IF
    they were 0.5 s instead of being exempted from the gate."""
    return big_s > bound * max(base_s, 0.5)


def run_tier(
    spark, sf_dir: str, names=None, with_grams_build: bool = True
) -> dict[str, float]:
    """Time the shared builds + the given registered queries (default:
    the full HEAVY list) at one tier. Shared with tools/scale_spot.py —
    one timing harness, one methodology."""
    from eprints_to_hyku_data_tool_spark.functions import copurchase, neardup

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    copurchase.undirected_edges(spark, sf_dir)
    copurchase.degrees(spark, sf_dir)
    copurchase.oriented_edges(spark, sf_dir)
    copurchase.triangle_node_stats(spark, sf_dir)
    out["_build_copurchase_graph"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    neardup.verified_pairs(spark, sf_dir)
    neardup.components(spark, sf_dir)
    out["_build_neardup_pairs"] = time.perf_counter() - t0

    if with_grams_build:
        from eprints_to_hyku_data_tool_spark.functions import grams

        t0 = time.perf_counter()
        grams.doc_grams8(spark, sf_dir)
        out["_build_doc_grams"] = time.perf_counter() - t0

    for name in HEAVY if names is None else names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = time.perf_counter() - t0
        print(f"  {name}: {out[name]:.2f}s", flush=True)
    return out


_run_tier = run_tier  # internal alias kept for the call sites below


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--tier", default="/tmp/scale10")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(_ROOT, "SCALE_SMOKE.json"))
    args = ap.parse_args()

    manifest = load_tier_manifest(args.tier, args.copies)

    from eprints_to_hyku_data_tool_spark.session import get_spark, warm_session

    spark = get_spark(
        app_name="scale-smoke",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        driver_memory="48g",
    )
    # Warm BEFORE the sf0.1 tier (code-review r15): the baseline is the
    # ratio DENOMINATOR — leaving JVM/Arrow/codegen first-touch cost in
    # it deflates every ratio and biases the gate toward PASS. Same
    # shared recipe as bench.py and the adjudicator (session.py).
    warm_session(spark, args.base)
    print(f"tier sf0.1: {args.base}", flush=True)
    base = _run_tier(spark, args.base)
    print(f"tier {args.copies}x: {args.tier}", flush=True)
    big = _run_tier(spark, args.tier)

    linear_bound = 2.0 * args.copies

    # Warm re-run for suspects (the bench.py lesson, observed on the smoke
    # too: single-pass numbers in an aged session vary 2-4x run-to-run —
    # z12790_corpus_pipeline measured 16 s and 59 s at the 10x tier on
    # IDENTICAL code in back-to-back serial runs). Any query past a QUARTER
    # of the failure bound (copies/2 vs the 2*copies bound — deliberately
    # broad, so contention artifacts get their retry before they can fail
    # the gate) gets one warm re-run and the min is recorded: a real
    # super-linear scaler survives the retry, a contention artifact does
    # not. `_build_*` entries are excluded — their memo makes a re-run
    # trivially ~0 s. A re-run that collapses >4x is additionally flagged
    # memo-assisted in the report: the second pass likely rode a
    # session-memoized intermediate (pair graph, co-purchase build), so its
    # min may understate the genuine cold cost.
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # Absolute-form trigger (code-review r15, mirrors the failure gate
    # below): judging `ratio` only when base >= 0.5 exempted every
    # sub-half-second baseline from the gate entirely, however
    # catastrophically it scaled — max(base, 0.5) keeps the noise
    # immunity (a tiny baseline is judged as if it were 0.5 s) without
    # the blind spot.
    suspects = sorted(
        n
        for n in base
        if not n.startswith("_build_")
        and gate_exceeds(big[n], base[n], args.copies / 2)
    )
    memo_assisted = {}
    for name in suspects:
        t0 = time.perf_counter()
        qs[name](spark, args.tier).write.format("noop").mode(
            "overwrite"
        ).save()
        rerun = time.perf_counter() - t0
        print(f"  rerun {name}: {rerun:.2f}s (was {big[name]:.2f}s)", flush=True)
        if rerun < big[name] / 4.0:
            # A >4x collapse means the re-run almost certainly rode a
            # session-memoized intermediate, so its min would let a
            # genuinely regressed memo-backed query PASS the linear
            # gate with only a report-level flag (code review r9).
            # Fail-safe: the gate judges the COLD time for these; the
            # warm number is recorded for the human reading the report,
            # and a cold contention artifact then fails loudly into a
            # fresh-session adjudication instead of passing silently.
            memo_assisted[name] = {
                "cold_sec": round(big[name], 3),
                "warm_sec": round(rerun, 3),
            }
        else:
            big[name] = min(big[name], rerun)
    spark.stop()

    # `_build_*` entries get no in-session retry (the memo makes one
    # ~0 s), but they ARE the most contention-exposed timings (bench.py
    # grew warm_rerun_flagged_builds for exactly this) — so a build
    # whose ratio would fail the gate gets ONE fresh-subprocess
    # re-measure (tables warmed, build timed cold, the adjudicator's
    # own runner) before the verdict; a real super-linear build
    # survives it, a contention artifact does not.
    for name in sorted(base):
        if not name.startswith("_build_"):
            continue
        if gate_exceeds(big[name], base[name], linear_bound):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from adjudicate import run_build_sessions

            fresh = run_build_sessions([name], args.tier, 1)[name][0]
            print(
                f"  fresh build rerun {name}: {fresh:.2f}s "
                f"(was {big[name]:.2f}s)",
                flush=True,
            )
            big[name] = min(big[name], fresh)

    rows = {}
    failures = []
    for name in base:
        ratio = big[name] / max(base[name], 1e-9)
        rows[name] = {
            "sf01_sec": round(base[name], 3),
            "x10_sec": round(big[name], 3),
            "ratio": round(ratio, 2),
        }
        if name in memo_assisted:
            rows[name]["memo_assisted_warm_sec"] = memo_assisted[name][
                "warm_sec"
            ]
        # Absolute form (code-review r15): sub-second sf0.1 baselines
        # are noise-dominated, so they are judged AS IF they were 0.5 s
        # — the old `base >= 0.5 and ratio > bound` exempted them from
        # the gate entirely (a 0.4 s query blowing up to 90 s at 10x
        # printed FAILURES: none).
        if gate_exceeds(big[name], base[name], linear_bound):
            failures.append(name)
    report = {
        "copies": args.copies,
        "linear_bound": linear_bound,
        "tier_manifest": {
            "copies": manifest["copies"],
            "rows": manifest["rows"],
        },
        "queries": rows,
        "failures": failures,
        "memo_assisted_reruns": memo_assisted,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["ratio"] for k, v in rows.items()}, indent=1))
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()
