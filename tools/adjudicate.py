"""Mechanical bench-flag adjudication (VERDICT r8 item 4).

Every round since r5 produced an in-suite bench regression flag, and
every single one was refuted by the same manual procedure: re-run the
flagged query in a FRESH session (bench-style warmup, shared builds
pre-paid), take the min of 3, compare against the previous round's
value. In-suite numbers in an aged 208-query session carry
session-state contention (JIT code-cache churn, checkpoint-block GC
pressure, python-worker turnover) that bench's own in-session warm
re-runs bound but cannot eliminate — only a fresh session separates
plan cost from session age (BASELINE.md records z60 r5, z196 r6, five
r7 flags, q90 r8, all refuted this way).

This tool is that procedure as one command:

    python tools/adjudicate.py [--bench BENCH_local.json] [--runs 3]
                               [--no-baseline]

- reads the newest bench payload's `regressions` map (accepts either
  the full BENCH_local.json sidecar or a driver BENCH_r*.json wrapper,
  whose payload sits under "parsed");
- `_build_*` flags (bench's one-time shared-intermediate entries) are
  session-memoized, so they are timed in one fresh session PER RUN
  (tables/Arrow warmed, build timed once) instead of re-run in-session
  where the memo would measure ~0 s;
- spawns ONE fresh python/Spark session that performs bench.py's
  warmup (full table scans + Arrow worker spin-up + shared builds),
  then runs each flagged query `--runs` times;
- classifies each flag against its recorded `prev`:
      warm_min <= prev * 1.2   -> "refuted"      (contention class)
      warm_min >  prev * 1.5   -> "confirmed"    (real regression)
      otherwise                -> "inconclusive" (inside ambient band)
- writes the verdicts back into the sidecar under "adjudications" and
  appends a markdown table row per flag to BASELINE.md's
  "Machine adjudications" section (unless --no-baseline).

Exit code: 0 when no flags or all refuted; 2 when any flag is
confirmed or inconclusive (a human should look).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import textwrap

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = textwrap.dedent(
    """
    import json, sys, time
    sys.path.insert(0, {root!r})
    import pandas as pd
    from eprints_to_hyku_data_tool_spark.session import get_spark
    from eprints_to_hyku_data_tool_spark.plans.registry import (
        REGISTRY, _load_all,
    )
    from eprints_to_hyku_data_tool_spark.session import warm_session

    sf_dir, runs, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    spark = get_spark(app_name="adjudicate", driver_memory="48g")
    _load_all()
    # The ONE shared warm-up recipe (session.warm_session): the
    # adjudicator's premise is that its fresh sessions are warmed
    # EXACTLY like bench.py's, so the recipe must not be a hand-kept
    # copy that can drift (code-review r14).
    warm_session(spark, sf_dir)

    # Pre-pay ALL THREE session-memoized shared intermediates so family
    # queries measure marginals, exactly like bench.py (grams was
    # missing here once: a grams-family flag then paid the one-time
    # doc_grams8 build inside its first timed run and could be wrongly
    # 'confirmed').
    from eprints_to_hyku_data_tool_spark.functions import (
        copurchase,
        grams,
        neardup,
    )

    copurchase.triangle_node_stats(spark, sf_dir)
    neardup.components(spark, sf_dir)
    grams.doc_grams8(spark, sf_dir)

    out = {{}}
    from eprints_to_hyku_data_tool_spark.functions import ordering

    for name in names:
        ts = []
        for _ in range(runs):
            # Warm runs 2+ of an ordering-kernel consumer would read the
            # run-1 pin cache (CacheManager matches equal plans) and
            # time a cache read, not the sort — the warm min would then
            # refute a real kernel regression with a vacuous number.
            ordering.release_pins()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
    spark.stop()
    print("ADJUDICATE_JSON:" + json.dumps(out))
    """
).format(root=_ROOT)


_BUILD_RUNNER = textwrap.dedent(
    """
    import json, sys, time
    sys.path.insert(0, {root!r})
    from eprints_to_hyku_data_tool_spark.session import get_spark, warm_session

    sf_dir, name = sys.argv[1], sys.argv[2]
    spark = get_spark(app_name="adjudicate-build", driver_memory="48g")
    # The ONE shared warm-up recipe — see _RUNNER (code-review r14).
    warm_session(spark, sf_dir)

    from eprints_to_hyku_data_tool_spark.functions import (
        copurchase,
        grams,
        neardup,
    )

    builds = {{
        "_build_copurchase_graph": lambda: copurchase.triangle_node_stats(
            spark, sf_dir
        ),
        "_build_neardup_pairs": lambda: neardup.components(spark, sf_dir),
        "_build_doc_grams": lambda: grams.doc_grams8(spark, sf_dir),
    }}
    t0 = time.perf_counter()
    builds[name]()
    out = {{name: [round(time.perf_counter() - t0, 3)]}}
    spark.stop()
    print("ADJUDICATE_JSON:" + json.dumps(out))
    """
).format(root=_ROOT)


def load_payload(path: str) -> dict:
    """Full bench payload from either sidecar or driver-wrapper shape.

    A driver wrapper with parsed:null (the truncated-stdout case) must
    NOT silently fall back to the wrapper dict — it has no
    'regressions' key, so the tool would print 'no regression flags'
    and exit 0 while flags sit unadjudicated in the tail text. Try to
    scavenge a payload from the wrapper's raw tail; otherwise fail
    loudly."""
    data = json.load(open(path))
    if "parsed" in data and data["parsed"] is None:
        for key in ("tail", "stdout", "raw"):
            text = data.get(key)
            if not isinstance(text, str):
                continue
            for line in reversed(text.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        return json.loads(line)
                    except json.JSONDecodeError:
                        continue
        raise SystemExit(
            f"ADJUDICATE: {path} has parsed:null and no scavengeable "
            "payload line — cannot adjudicate; re-run bench"
        )
    return data.get("parsed") or data


def classify(prev: float, warm_min: float) -> str:
    if warm_min <= prev * 1.2:
        return "refuted"
    if warm_min > prev * 1.5:
        return "confirmed"
    return "inconclusive"


def run_fresh_session(
    names: list[str], sf_dir: str, runs: int
) -> dict[str, list[float]]:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, sf_dir, str(runs), *names],
        capture_output=True,
        text=True,
        cwd=_ROOT,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ADJUDICATE_JSON:"):
            return json.loads(line[len("ADJUDICATE_JSON:") :])
    raise RuntimeError(
        f"fresh-session runner failed (rc={proc.returncode}):\n"
        + proc.stdout[-2000:]
        + proc.stderr[-2000:]
    )


def run_build_sessions(
    names: list[str], sf_dir: str, runs: int
) -> dict[str, list[float]]:
    """Fresh-session timing for `_build_*` flags. A build is
    session-memoized, so in-session re-runs measure the memo (~0 s) —
    each timed run therefore gets its OWN fresh session (tables + Arrow
    worker warmed, like bench.py's preamble, then the build timed
    once); min-of-N still separates plan cost from ambient state, just
    across sessions instead of within one."""
    out: dict[str, list[float]] = {}
    for name in names:
        ts: list[float] = []
        for _ in range(runs):
            proc = subprocess.run(
                [sys.executable, "-c", _BUILD_RUNNER, sf_dir, name],
                capture_output=True,
                text=True,
                cwd=_ROOT,
                timeout=1800,
            )
            got = None
            for line in proc.stdout.splitlines():
                if line.startswith("ADJUDICATE_JSON:"):
                    got = json.loads(line[len("ADJUDICATE_JSON:") :])
            if got is None:
                raise RuntimeError(
                    f"build runner failed for {name} "
                    f"(rc={proc.returncode}):\n"
                    + proc.stdout[-2000:]
                    + proc.stderr[-2000:]
                )
            ts.extend(got[name])
        out[name] = ts
    return out


def adjudicate(
    regressions: dict[str, dict],
    warm: dict[str, list[float]],
) -> dict[str, dict]:
    out = {}
    for name, flag in regressions.items():
        runs = warm.get(name)
        if not runs:
            continue
        warm_min = min(runs)
        out[name] = {
            "prev": flag.get("prev"),
            "flagged": flag.get("now"),
            "warm_runs": runs,
            "warm_min": warm_min,
            "verdict": classify(float(flag["prev"]), warm_min),
        }
    return out


_BASELINE_HEADER = "## Machine adjudications (tools/adjudicate.py)"


def append_baseline_rows(verdicts: dict[str, dict], label: str) -> None:
    path = os.path.join(_ROOT, "BASELINE.md")
    text = open(path).read()
    if _BASELINE_HEADER not in text:
        text += (
            f"\n{_BASELINE_HEADER}\n\n"
            "Fresh-session warm-standalone re-runs of in-suite bench\n"
            "flags, recorded by the tool (procedure and thresholds in its\n"
            "docstring). `refuted` = session-state contention, the class\n"
            "every flag since r5 has fallen into.\n\n"
            "| run | query | prev | flagged | warm runs | warm min |"
            " verdict |\n"
            "|---|---|---|---|---|---|---|\n"
        )
    rows = ""
    for name, v in sorted(verdicts.items()):
        runs = " / ".join(f"{t:.2f}" for t in v["warm_runs"])
        rows += (
            f"| {label} | {name} | {v['prev']:.2f} s | "
            f"{v['flagged']:.2f} s | {runs} s | **{v['warm_min']:.2f} s** "
            f"| {v['verdict']} |\n"
        )
    # Insert at the end of the section's FIRST table, not end-of-file:
    # any section added below "Machine adjudications" would otherwise
    # swallow new verdict rows (code review r9), and a later section
    # containing its own markdown table must not capture them either
    # (code review r10) — so stop at the first non-"|" line after the
    # first contiguous "|" run, never scanning for a global last row.
    head, _, tail = text.rpartition(_BASELINE_HEADER)
    lines = tail.split("\n")
    last_row = 0
    in_table = False
    for i, ln in enumerate(lines):
        if ln.startswith("|"):
            last_row = i
            in_table = True
        elif in_table:
            break
    insert_at = last_row + 1 if last_row else len(lines)
    lines[insert_at:insert_at] = rows.rstrip("\n").split("\n")
    open(path, "w").write(head + _BASELINE_HEADER + "\n".join(lines))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=os.path.join(_ROOT, "BENCH_local.json"))
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    payload = load_payload(args.bench)
    regressions = payload.get("regressions") or {}
    if not regressions:
        print("ADJUDICATE: no regression flags in", args.bench)
        return 0

    print(f"ADJUDICATE: {len(regressions)} flag(s):", sorted(regressions))
    build_names = sorted(n for n in regressions if n.startswith("_build_"))
    query_names = sorted(n for n in regressions if not n.startswith("_build_"))
    warm: dict[str, list[float]] = {}
    if query_names:
        warm.update(run_fresh_session(query_names, args.sf_dir, args.runs))
    if build_names:
        warm.update(run_build_sessions(build_names, args.sf_dir, args.runs))
    verdicts = adjudicate(regressions, warm)

    # write back into the sidecar payload (wrapper shape preserved)
    data = json.load(open(args.bench))
    target = data.get("parsed") if isinstance(data.get("parsed"), dict) else data
    target["adjudications"] = verdicts
    # Serialize BEFORE touching the file, then rename atomically — an
    # exception mid-dump into an already-truncated sidecar would destroy
    # the round's bench record (code review r9).
    blob = json.dumps(data, indent=1, sort_keys=True)
    tmp = args.bench + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(blob)
    os.replace(tmp, args.bench)

    if not args.no_baseline:
        label = args.label or os.path.basename(args.bench)
        append_baseline_rows(verdicts, label)

    bad = False
    for name, v in sorted(verdicts.items()):
        print(
            f"ADJUDICATE {name}: prev {v['prev']}s, flagged {v['flagged']}s,"
            f" warm {v['warm_runs']} -> min {v['warm_min']}s:"
            f" {v['verdict'].upper()}"
        )
        bad |= v["verdict"] != "refuted"
    return 2 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
