"""Optimization-round measurement probe (guide §1).

For each named registry entry (or `_build_*` shared build), in ONE fresh
bench-warmed session:

- capture `.explain("formatted")` to plans/<round>/<name>_<tag>.txt
  (the judge checks plan claims against these files);
- time the query via the noop sink, min of --runs (default 3), with
  `spark.sparkContext.setJobDescription(name)` so the UI/event log is
  readable (guide §1.5).

Usage:
    python tools/perf_probe.py --tag before --round r15 \
        q117588_pagerank z139190_column_profile ...

Shared builds are pre-paid exactly like bench.py so family queries
measure marginals; name a `_build_*` entry explicitly to time the build
itself in a fresh session instead (memo makes in-session re-runs ~0 s).
Prints one JSON line {name: min_seconds} at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r15")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-builds", action="store_true",
                    help="skip pre-paying the shared builds")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from eprints_to_hyku_data_tool_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )
    from eprints_to_hyku_data_tool_spark.session import get_spark, warm_session

    spark = get_spark(app_name="perf_probe", driver_memory="48g")
    _load_all()
    warm_session(spark, args.sf_dir)

    from eprints_to_hyku_data_tool_spark.functions import (
        copurchase,
        grams,
        neardup,
        ordering,
    )

    builds = {
        "_build_copurchase_graph": lambda: copurchase.triangle_node_stats(
            spark, args.sf_dir
        ),
        "_build_neardup_pairs": lambda: neardup.components(spark, args.sf_dir),
        "_build_doc_grams": lambda: grams.doc_grams8(spark, args.sf_dir),
    }

    plan_dir = os.path.join(_ROOT, "plans", args.round)
    os.makedirs(plan_dir, exist_ok=True)
    timings: dict[str, float] = {}

    build_names = [n for n in args.names if n.startswith("_build_")]
    query_names = [n for n in args.names if not n.startswith("_build_")]

    # Time requested builds FIRST (they are one-time memoized; the first
    # call pays the build).
    for name in build_names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        builds[name]()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    if not args.no_builds:
        for name, build in builds.items():
            if name not in build_names:
                build()

    def _collect_garbage():
        # Same periodic GC as bench.py: localCheckpoint blocks are only
        # released after BOTH a python GC (drops py4j refs) and a JVM GC;
        # without it a long probe list ages the session (block-manager
        # bloat + heap pressure) and later queries measure the aging, not
        # the plan (observed: column_profile 28 s late in a 20-query
        # probe vs 4.4 s fresh).
        import gc as _gc

        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    for name in query_names:
        _collect_garbage()
        spec = REGISTRY[name]
        df = spec.fn(spark, args.sf_dir)
        plan_path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
        with open(plan_path, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
            fh.write("\n")
        best = None
        for _ in range(args.runs):
            ordering.release_pins()
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
