"""Whole-registry plan census on the final r16 tree (same format as
plans/r15/plan_audit_before.json) + a diff against the r15 census."""
import json, re, sys
sys.path.insert(0, "/root/repo")
from eprints_to_hyku_data_tool_spark.session import get_spark
from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all

spark = get_spark(app_name="plan_census", cpus=32)
_load_all()
sf = "/root/testdata/sf0.1"
out = {}
for name, spec in sorted(REGISTRY.items()):
    try:
        df = spec.fn(spark, sf)
        if df.isStreaming:
            continue
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    except Exception as exc:
        out[name] = {"error": str(exc)[:200]}
        continue
    scans = {}
    for m in re.finditer(r"Location: .*?/([a-z_0-9]+\.parquet)", p):
        scans[m.group(1)] = scans.get(m.group(1), 0) + 1
    udfs = re.findall(r"(?:ArrowEvalPython|BatchEvalPython) \[([a-zA-Z_0-9]+)\(", p)
    dup = sorted({u for u in udfs if udfs.count(u) > 1})
    out[name] = {
        "n_ops": len(re.findall(r"^\(\d+\) ", p, re.M)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", p)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", p)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", p)),
        "shj": len(re.findall(r"\(\d+\) ShuffledHashJoin", p)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", p)),
        "py": len(re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", p)),
        "window": len(re.findall(r"\(\d+\) Window\b", p)),
        "sort": len(re.findall(r"\(\d+\) Sort\b", p)),
        "scans": scans,
        "dup_udf": dup,
        "rddscan": len(re.findall(r"Scan ExistingRDD", p)),
    }
with open("/root/repo/plans/r16/plan_audit_close.json", "w") as fh:
    json.dump(out, fh, indent=0, sort_keys=True)
    fh.write("\n")

old = json.load(open("/root/repo/plans/r15/plan_audit_before.json"))
cart = [n for n, v in out.items() if v.get("cartesian")]
dup = [n for n, v in out.items() if v.get("dup_udf")]
errs = [n for n, v in out.items() if "error" in v]
print("queries:", len(out), "cartesians:", cart, "dup_udfs:", dup, "errors:", errs)
moved = []
for n, v in out.items():
    o = old.get(n)
    if not o or "error" in v:
        continue
    for k in ("exchanges", "smj", "py", "cartesian"):
        if v[k] != o.get(k):
            moved.append((n, k, o.get(k), v[k]))
for m in sorted(moved):
    print("CHANGED", m)
