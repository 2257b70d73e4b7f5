"""Round-5 batch D (part 1): data-quality / profiling operators. A
migration tool is judged by the data it refuses to ship: these are the
expectation-suite, drift-monitor, and histogram shapes that run as
gates around every batch (Great-Expectations-style checks, relationally,
at engine speed — no per-row Python).

- q37  expectations audit (uniqueness / range / set / FK rules -> verdict rows)
- q38  schema drift monitor (per-column stats across two time slices)
- q39  histogram (equi-depth ntile + equi-width integer binning, one output)

Cross-engine hash discipline (registry.py): counts are exact integers;
every emitted double is a single IEEE division (or fixed-form ratio) of
exactly-aggregated integers — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Q37 — expectations audit
# --------------------------------------------------------------------------
@register(
    "q9337_expectations_audit",
    oracle="""
    WITH o_pass AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_set
      FROM orders),
    l_pass AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.11
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_null,
             CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_qty
      FROM lineitem),
    uq AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v
      FROM orders),
    fk AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    SELECT * FROM (
      SELECT 'orders.o_orderkey is unique' AS rule, n AS n_checked,
             v AS n_violations, v = 0 AS passed FROM uq
      UNION ALL
      SELECT 'orders.o_totalprice in (0, 1e6]', n, v_range,
             v_range = 0 FROM o_pass
      UNION ALL
      SELECT 'orders.o_orderpriority in accepted set', n, v_set,
             v_set = 0 FROM o_pass
      UNION ALL
      SELECT 'lineitem.l_discount in [0, 0.11]', n, v_disc,
             v_disc = 0 FROM l_pass
      UNION ALL
      SELECT 'lineitem.l_shipdate not null', n, v_null,
             v_null = 0 FROM l_pass
      UNION ALL
      SELECT 'lineitem.l_quantity > 0', n, v_qty, v_qty = 0 FROM l_pass
      UNION ALL
      SELECT 'lineitem.l_orderkey references orders', n, v, v = 0 FROM fk)
    """,
    doc="Expectation-suite audit: seven declarative data-quality rules "
    "(key uniqueness, numeric range, accepted-value set, not-null, "
    "positivity, referential integrity) evaluated in ONE pass per "
    "fact table — all same-table rules fold into a single conditional "
    "aggregation (one scan, map-side combined), uniqueness is a "
    "count-vs-distinct delta, and the FK rule is a left-anti join on "
    "the key. Output is one verdict row per rule with exact checked/ "
    "violation counts, the gate shape a pipeline asserts before "
    "shipping a batch. At 100 TB: two fact scans + one anti join "
    "total, no matter how many same-table rules are added; rule "
    "results are single-row aggregates unioned driver-free.",
)
def q9337_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    # ONE aggregation per fact table carries every same-table rule,
    # including the uniqueness delta (mixed distinct + plain aggs, the
    # z30 engine shape) — adding a rule never adds a scan.
    o_pass = orders.agg(
        F.count(F.lit(1)).alias("n"),
        cnt(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1_000_000)
        ).alias("v_range"),
        cnt(
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            )
        ).alias("v_set"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("v_uq"),
    )
    l_pass = li.agg(
        F.count(F.lit(1)).alias("n"),
        cnt(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.11)
        ).alias("v_disc"),
        cnt(F.col("l_shipdate").isNull()).alias("v_null"),
        cnt(F.col("l_quantity") <= 0).alias("v_qty"),
    )
    fk_viol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )

    # Fan the one aggregate row out to per-rule verdict rows with
    # stack(), NOT a union of projections over the shared aggregate —
    # union branches re-plan (and re-scan) their common subtree, which
    # this shape avoids by construction (the q37 9-scan lesson).
    o_rows = o_pass.select(
        F.col("n").alias("n_checked"),
        F.expr(
            "stack(3, 'orders.o_orderkey is unique', v_uq, "
            "'orders.o_totalprice in (0, 1e6]', v_range, "
            "'orders.o_orderpriority in accepted set', v_set) "
            "AS (rule, v)"
        ),
    )
    l_rows = l_pass.crossJoin(F.broadcast(fk_viol)).select(
        F.col("n").alias("n_checked"),
        F.expr(
            "stack(4, 'lineitem.l_discount in [0, 0.11]', v_disc, "
            "'lineitem.l_shipdate not null', v_null, "
            "'lineitem.l_quantity > 0', v_qty, "
            "'lineitem.l_orderkey references orders', v_fk) "
            "AS (rule, v)"
        ),
    )
    return o_rows.unionAll(l_rows).select(
        "rule",
        "n_checked",
        F.col("v").cast("long").alias("n_violations"),
        (F.col("v") == 0).alias("passed"),
    )


# --------------------------------------------------------------------------
# Q38 — schema drift monitor
# --------------------------------------------------------------------------
_SPLIT = "2024-01-16 00:00:00"


@register(
    "q9338_schema_drift",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, value,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS value_u,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             ts < TIMESTAMP '{_SPLIT}' AS in_a
      FROM events),
    halves AS (
      SELECT in_a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(value_u) AS BIGINT) AS sum_value_u,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_value,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_user,
             CAST(SUM(k) AS BIGINT) AS sum_k
      FROM ev GROUP BY in_a),
    m AS (
      SELECT in_a, metric, val FROM halves UNPIVOT (
        val FOR metric IN (n, sum_value_u, null_value, ndv_type,
                           ndv_user, sum_k))),
    wide AS (
      SELECT metric,
             MAX(CASE WHEN in_a THEN val END) AS a_val,
             MAX(CASE WHEN NOT in_a THEN val END) AS b_val
      FROM m GROUP BY metric)
    SELECT metric, a_val, b_val,
           CAST(b_val AS DOUBLE) / CAST(a_val AS DOUBLE) AS b_over_a
    FROM wide WHERE a_val <> 0
    """,
    doc="Schema/stat drift monitor: the event stream is split at a "
    "fixed boundary into a reference half and a current half, and "
    "per-column statistics (row count, exact quantized value mass, "
    "null count, event-type and user NDV, JSON-field mass) are "
    "computed for each in ONE grouped pass, unpivoted to metric rows, "
    "and compared as a b/a ratio — the input-data contract check that "
    "catches a silently shifted upstream schema (new enum value, "
    "nulls appearing, volume drop) before it poisons a training run. "
    "Exact integers throughout; the only double is the final ratio "
    "division. At 100 TB: one scan, one two-group aggregate (the "
    "grouping key has two values — partial aggregation does all the "
    "work map-side), O(metrics) output rows. The PSI companion for "
    "distribution-level drift is q27.",
)
def q9338_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("value_u"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        (F.col("ts") < F.lit(_SPLIT).cast("timestamp")).alias("in_a"),
    )
    halves = ev.groupBy("in_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_u").alias("sum_value_u"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_value"),
        F.count_distinct("event_type").alias("ndv_type"),
        F.count_distinct("user_id").alias("ndv_user"),
        F.sum("k").alias("sum_k"),
    )
    m = halves.select(
        "in_a",
        F.expr(
            "stack(6, 'n', n, 'sum_value_u', sum_value_u, "
            "'null_value', null_value, 'ndv_type', ndv_type, "
            "'ndv_user', ndv_user, 'sum_k', sum_k) AS (metric, val)"
        ),
    )
    wide = m.groupBy("metric").agg(
        F.max(F.when(F.col("in_a"), F.col("val"))).alias("a_val"),
        F.max(F.when(~F.col("in_a"), F.col("val"))).alias("b_val"),
    )
    return wide.filter(F.col("a_val") != 0).select(
        "metric",
        "a_val",
        "b_val",
        (F.col("b_val").cast("double") / F.col("a_val").cast("double")).alias(
            "b_over_a"
        ),
    )


# --------------------------------------------------------------------------
# Q39 — equi-depth + equi-width histogram
# --------------------------------------------------------------------------
_NBINS = 10


@register(
    "z129539_histogram",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders),
    depth AS (
      SELECT 'equi-depth' AS kind,
             CAST(ntile({_NBINS}) OVER (ORDER BY cents, o_orderkey) - 1
                  AS INT) AS bucket,
             cents
      FROM o),
    ext AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM o),
    width AS (
      SELECT 'equi-width' AS kind,
             CAST(LEAST((cents - ext.lo) * {_NBINS} // (ext.hi - ext.lo + 1),
                        {_NBINS - 1}) AS INT) AS bucket,
             cents
      FROM o, ext)
    SELECT kind, bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
    FROM (SELECT * FROM depth UNION ALL SELECT * FROM width)
    GROUP BY kind, bucket
    """,
    doc="Histogram kit: the same measure (order totals as exact cents) "
    "binned both ways a profiler needs — equi-DEPTH buckets from the "
    "deterministic (cents, key) total order (bucket populations differ "
    "by at most 1), and equi-WIDTH via pure-integer bin arithmetic "
    "floor((x-lo)*B/(hi-lo+1)) over the global extrema (a 2-scalar "
    "broadcast, not a driver round-trip). Output per (kind, bucket): "
    "exact count and observed bounds — the input for range-partitioner "
    "boundary selection and for optimizer column statistics alike. "
    "The depth branch does NOT use a bare ntile window (that funnels "
    "100 TB through one task): it rides the two-phase distributed "
    "global-position engine (functions/ordering.py, z37's kernel — "
    "range shuffle + local ranks + broadcast offsets) and converts "
    "positions with ntile's TRUE mapping — with q = n div B, "
    "r = n mod B, the first r buckets get q+1 rows: bucket = "
    "(pos-1) div (q+1) if pos <= r*(q+1) else r + (pos-1-r*(q+1)) "
    "div q — bit-identical to the oracle's ntile for EVERY n, not "
    "just multiples of B (the round-5 floor((pos-1)*B/n) shortcut "
    "diverged whenever B did not divide n — ADVICE r5; regression "
    "test: tests/test_plans.py non-divisible-n case). The approximate "
    "100 TB path is the KLL/approx-percentile family (z192) — both "
    "registered, trade-off explicit.",
)
def z129539_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ordering import with_global_position

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    total = o.agg(F.count(F.lit(1)).alias("n_total"))
    pos = with_global_position(
        o, [F.col("cents"), F.col("o_orderkey")], "pos"
    )
    from ..functions.ordering import exact_int_div, ntile_bucket

    depth = pos.crossJoin(F.broadcast(total)).select(
        F.lit("equi-depth").alias("kind"),
        ntile_bucket(F.col("pos"), F.col("n_total"), _NBINS).alias(
            "bucket"
        ),
        "cents",
    )
    ext = o.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    width = o.crossJoin(F.broadcast(ext)).select(
        F.lit("equi-width").alias("kind"),
        F.least(
            # same exact integer-div idiom as the depth branch (the
            # oracle's // is integer division; floor over a double
            # quotient can differ by one ulp at extreme magnitudes)
            exact_int_div(
                (F.col("cents") - F.col("lo")) * _NBINS,
                F.col("hi") - F.col("lo") + 1,
            ),
            F.lit(_NBINS - 1).cast("long"),
        )
        .cast("int")
        .alias("bucket"),
        "cents",
    )
    return (
        depth.unionAll(width)
        .groupBy("kind", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )
