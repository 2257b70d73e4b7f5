"""Advanced aggregations: SURVEY.md §2.4 Q22-Q30.

The reference repo has no code (SURVEY.md §0); these are the reporting
aggregates of the domain: hierarchical rollups, crosstabs, the Bulkrax
multi-value fold (Q25 — the one operation this migration domain exists
for), percentiles/statistics for profiling, and approximate distinct
counts for 100 TB cardinality estimation.

Scale posture: every group-by gets automatic map-side partial aggregation;
rollup/cube expand before the shuffle but group counts stay tiny.
Q25's collect_list is bounded by lines-per-order (~7), never unbounded.
Approx/percentile numerics follow SURVEY §5: approx values never enter the
hashed output directly (Q22 emits a tolerance verdict; Q27 uses exact
percentile, rounded on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
from .q_core import dec_sum


# --------------------------------------------------------------------------
# Q22 — approx count-distinct (HLL) with a checkable tolerance verdict
# --------------------------------------------------------------------------
@register(
    "q10622_approx_count_distinct",
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_5pct
    FROM lineitem
    GROUP BY l_suppkey
    """,
    doc="approx_count_distinct(rsd=0.01) per supplier. The HLL estimate "
    "itself is engine-specific and never hashed; the query emits the "
    "exact count plus a verdict that the estimate is within 5% of it "
    "(measured max error at this rsd is 1.7% — 3x margin). At 100 TB "
    "the approx path replaces the exact one: HLL sketches merge "
    "map-side with O(1) state vs the Expand shuffle of exact distinct "
    "(SURVEY §2.4 Q22, §7 hard-item 5). Two-phase shape: distinct "
    "(suppkey, partkey) pairs first, then count + HLL per suppkey — "
    "mixing countDistinct and HLL in one agg over the raw table makes "
    "every raw row update a 16KB HLL++ buffer through the Expand "
    "(measured 60s at sf0.1 vs 4s for this form).",
)
def q10622_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    return (
        pairs.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        )
        .select(
            "l_suppkey",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("hll_within_5pct"),
        )
    )


# --------------------------------------------------------------------------
# Q23 — ROLLUP (hierarchical subtotals)
# --------------------------------------------------------------------------
@register(
    "q10623_rollup",
    oracle="""
    SELECT COALESCE(r_name, '(all)') AS region_name,
           COALESCE(n_name, '(all)') AS nation_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP over the region>nation hierarchy with grouping() markers "
    "(real NULLs vs subtotal NULLs are distinguishable) "
    "(SURVEY §2.4 Q23).",
)
def q10623_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", "total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "g_region",
            "g_nation",
            "n_customers",
            "total_bal",
        )
    )


# --------------------------------------------------------------------------
# Q24 — CUBE (all grouping combinations)
# --------------------------------------------------------------------------
@register(
    "q10624_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all four grouping-set combinations "
    "in one pass (Expand + single shuffle) (SURVEY §2.4 Q24).",
)
def q10624_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Q25 — collect_list -> sorted delimited string (THE Bulkrax fold)
# --------------------------------------------------------------------------
@register(
    "q10625_bulkrax_fold",
    oracle="""
    SELECT l_orderkey,
           string_agg(p_name, '|' ORDER BY p_name) AS part_names,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey
    """,
    doc="The core Bulkrax multi-value fold: child values collected per "
    "parent, SORTED (collect_list order is nondeterministic in a "
    "distributed engine — sort_array makes it canonical), joined with "
    "'|' for the flat CSV cell (SURVEY §1.1, §2.4 Q25).",
)
def q10625_bulkrax_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("p_name"))).alias(
                "part_names"
            ),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


# --------------------------------------------------------------------------
# Q26 — pivot (crosstab QA report)
# --------------------------------------------------------------------------
@register(
    "z11626_pivot",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Pivot: order counts per segment with status as columns. Explicit "
    "value list (F/O/P) keeps the schema static — required for a "
    "deterministic plan at scale (no pre-pass to discover values). The "
    "customer join is NOT hint-broadcast: customer scales with SF (not a "
    "fixed dim like nation/region), so AQE decides — broadcast at "
    "fixture scale (plan-asserted), sort-merge when it outgrows the "
    "threshold (SURVEY §2.4 Q26).",
)
def z11626_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pivoted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


# --------------------------------------------------------------------------
# Q27 — percentiles / median (exact)
# --------------------------------------------------------------------------
@register(
    "z11627_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Exact interpolated percentiles per segment (Spark percentile == "
    "DuckDB quantile_cont, both linear interpolation; rounded 4dp since "
    "the interpolation arithmetic isn't bit-portable). "
    "percentile_approx is the 100 TB variant (mergeable sketch, not "
    "hashable) — exercised in tests. The customer join is NOT "
    "hint-broadcast (customer scales with SF): AQE broadcasts at "
    "fixture scale (plan-asserted), sort-merges past the threshold "
    "(SURVEY §2.4 Q27).",
)
def z11627_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Q28 — statistical aggregates
# --------------------------------------------------------------------------
@register(
    "q10628_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS qty_stddev,
           round(var_samp(l_quantity), 4) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Profiling statistics: stddev/variance/correlation/covariance per "
    "return flag. Rounded on both sides — single-pass moment merges are "
    "partition-order dependent in the low bits (SURVEY §2.4 Q28).",
)
def q10628_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
    )


# --------------------------------------------------------------------------
# Q29 — filtered / conditional aggregation
# --------------------------------------------------------------------------
@register(
    "q10629_conditional_agg",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS error_rate,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
                AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    doc="Conditional aggregation (count_if / sum-where): per-user QA "
    "counters — error rate and purchase value in one pass over events "
    "(SURVEY §2.4 Q29).",
)
def q10629_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    cnt = F.count(F.lit(1))
    return ev.groupBy("user_id").agg(
        cnt.alias("n_events"),
        F.sum(is_err).alias("n_errors"),
        (F.sum(is_err).cast("double") / cnt).alias("error_rate"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("purchase_value"),
    )


# --------------------------------------------------------------------------
# Q30 — mixed distinct + plain aggregates
# --------------------------------------------------------------------------
@register(
    "z10630_mixed_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Mixed distinct + plain aggregates in one group-by — Spark plans "
    "an Expand (one row replica per distinct column) + two-phase "
    "aggregate (SURVEY §2.4 Q30).",
)
def z10630_mixed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dec_sum("l_quantity", "sum_qty"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Y46 — GROUPING SETS via the SQL entry point
# --------------------------------------------------------------------------
@register(
    "z139189_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (the general form of z23's ROLLUP / "
    "z24's CUBE: an arbitrary subset of grouping combinations), issued "
    "through the SQL ENTRY POINT (SURVEY §3 entry point 2): the query "
    "text goes to spark.sql() against a registered temp view, and "
    "Catalyst compiles it to the same Expand + partial-agg plan the "
    "DataFrame API produces — one shuffle regardless of how many sets "
    "are requested, sets-count x map-side expansion before it. Sums in "
    "DECIMAL then cast (fleet rule), grouping() markers distinguish "
    "subtotal NULLs from data NULLs.",
)
def z139189_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("y46_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
               COALESCE(l_linestatus, '(all)') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM y46_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


# --------------------------------------------------------------------------
# Y49 — approx percentile (t-digest-style sketch) with a tolerance verdict
# --------------------------------------------------------------------------
@register(
    "z117192_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           TRUE AS a50_within_1pct,
           TRUE AS a95_within_1pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="percentile_approx (Greenwald-Khanna sketch, accuracy=10000) per "
    "return flag, q22's verdict pattern: the sketch estimate is "
    "engine-specific and never hashed — the query emits the exact "
    "interpolated percentile (rounded 4dp, = DuckDB quantile_cont as in "
    "z27) plus a verdict that the approx value is within 1% of it "
    "(rank error <= n/accuracy ~ 2 ranks at sf0.01). At 100 TB the "
    "approx path REPLACES the exact one: GK sketches merge map-side "
    "with bounded state, while exact percentile materializes every "
    "group's values through the shuffle (SURVEY §2.4 Q27 scale note).",
)
def z117192_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Array-form percentiles (r15): percentile(col, p1) + percentile(
    # col, p2) as separate aggregates each build a FULL per-group
    # value buffer (and percentile_approx a full GK sketch) — four
    # whole-column aggregation buffers for two underlying structures.
    # The array form evaluates one buffer/sketch at both points with
    # the identical per-point algorithm, so the values are unchanged;
    # buffer construction and the shuffled partial-state volume halve.
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5D, 0.95D))"
        ).alias("pe"),
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5D, 0.95D), 10000)"
        ).alias("pa"),
        F.count(F.lit(1)).alias("n_lines"),
    ).select(
        "l_returnflag",
        F.round(F.element_at("pe", 1), 4).alias("p50_exact"),
        F.round(F.element_at("pe", 2), 4).alias("p95_exact"),
        F.element_at("pa", 1).alias("a50"),
        F.element_at("pa", 2).alias("a95"),
        "n_lines",
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.01 * F.abs(F.col(e))
    )
    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        within("a50", "p50_exact").alias("a50_within_1pct"),
        within("a95", "p95_exact").alias("a95_within_1pct"),
        "n_lines",
    )


# --------------------------------------------------------------------------
# Y50 — count-min sketch, built relationally (cross-engine exact)
# --------------------------------------------------------------------------
# Carter-Wegman universal hashes h_i(k) = ((a_i*k + b_i) mod P) mod W.
# P = 2^31-1 (Mersenne prime); a_i ~ 1e6 keeps a_i*k < 2^63 for keys up
# to 2^40, so the BIGINT arithmetic is overflow-free and IDENTICAL in
# every engine — unlike engine-native hash()/xxhash64, this sketch is
# bit-reproducible across Spark and DuckDB, so estimates hash-match.
_CMS_P = 2_147_483_647
_CMS_W = 512  # buckets per row; sketch size = D x W = 2048 counters
_CMS_SEEDS = (
    (1, 1_000_003, 817_504_243),
    (2, 1_000_033, 790_634_377),
    (3, 1_000_037, 146_204_723),
    (4, 1_000_039, 34_267_463),
)
_CMS_PROBE_MAX = 100  # bounded probe set (r2 verdict item 5 convention)


def _cms_bucket_sql(key: str, a: int, b: int) -> str:
    return f"(({a} * {key} + {b}) % {_CMS_P}) % {_CMS_W}"


@register(
    "z117193_countmin",
    oracle=f"""
    WITH seeds(h, a, b) AS (VALUES
        {", ".join(f"({h}, {a}, {b})" for h, a, b in _CMS_SEEDS)}),
    sk AS (
        SELECT h, ((a * user_id + b) % {_CMS_P}) % {_CMS_W} AS bucket,
               COUNT(*) AS cnt
        FROM events CROSS JOIN seeds
        GROUP BY h, ((a * user_id + b) % {_CMS_P}) % {_CMS_W}),
    probes AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events
        WHERE user_id <= {_CMS_PROBE_MAX} GROUP BY user_id),
    est AS (
        SELECT p.user_id, MIN(s.cnt) AS cms_estimate
        FROM probes p CROSS JOIN seeds sd
        JOIN sk s ON s.h = sd.h
                 AND s.bucket = ((sd.a * p.user_id + sd.b) % {_CMS_P})
                               % {_CMS_W}
        GROUP BY p.user_id)
    SELECT p.user_id,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           e.cms_estimate >= p.exact_cnt AS no_underestimate
    FROM probes p JOIN est e ON p.user_id = e.user_id
    """,
    doc="Count-min sketch for per-key frequency estimation, built "
    "RELATIONALLY: stack() fans each event into D=4 (hash-row, bucket) "
    "cells (map-side, no join), one groupBy collapses them into a "
    "D x W = 2048-counter sketch, and a broadcast equi-join answers "
    "point queries as min over the D rows. Carter-Wegman integer "
    "hashes make the sketch bit-identical in any engine, so the "
    "estimates themselves are hash-checked (stronger than q22's "
    "verdict pattern) plus the structural CMS guarantee "
    "estimate >= exact. At 100 TB: the sketch is a 2048-row partial "
    "aggregate (map-side combine, O(1) state), the probe side is a "
    "bounded 100-key set, and the exact_cnt column — here the "
    "comparison baseline — is what the sketch REPLACES "
    "(heavy-hitters / frequency-cap mandate).",
)
def z117193_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")

    stack_cells = ", ".join(
        f"{h}, {_cms_bucket_sql('user_id', a, b)}" for h, a, b in _CMS_SEEDS
    )
    sketch = (
        ev.select(
            F.expr(
                f"stack({len(_CMS_SEEDS)}, {stack_cells}) AS (h, bucket)"
            )
        )
        .groupBy("h", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    probes = (
        ev.filter(F.col("user_id") <= _CMS_PROBE_MAX)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    probe_cells = probes.select(
        "user_id",
        "exact_cnt",
        F.expr(f"stack({len(_CMS_SEEDS)}, {stack_cells}) AS (h, bucket)"),
    )
    est = (
        probe_cells.join(F.broadcast(sketch), ["h", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_cnt")).alias(
            "no_underestimate"
        ),
    )


# --------------------------------------------------------------------------
# Y60 — heavy hitters via distributed SpaceSaving (candidate + verify)
# --------------------------------------------------------------------------
_HH_K = 20  # reported top-k
_HH_M = 256  # SpaceSaving counters per task


@register(
    "q9434_heavyhitters",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT {_HH_K}
    """,
    doc="Top-{K} heaviest users via the two-scan bounded-memory heavy "
    "hitter pattern: scan 1 runs a SpaceSaving summary (m={M} "
    "counters, O(m) memory regardless of key cardinality) per task "
    "through mapInPandas and emits each task's candidate keys; "
    "scan 2 exactly recounts ONLY the (broadcast) candidates and "
    "takes the top k. The MG containment guarantee covers exactly "
    "the keys with global count > n/(m+1) (a key absent from EVERY "
    "task's summary has global count <= sum_t n_t/(m+1) = n/(m+1)), "
    "so the sketch path is provably exact only when the k-th "
    "recounted candidate clears that bound; this is CERTIFIED AT "
    "RUNTIME (ADVICE r3) and on flat/high-cardinality data where it "
    "cannot be certified the query falls back to a full exact "
    "group-by — output equals the oracle's top-k on every input, by "
    "proof on skewed data and by fallback otherwise. The sketch buys "
    "the 100 TB property that no stage holds cardinality-of-keys "
    "state when skew permits. The y50 CMS answers point queries on "
    "KNOWN keys; this FINDS the heavy keys (frequency-cap / "
    "spam-domain mandate).".format(K=_HH_K, M=_HH_M),
)
def q9434_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def spacesaving(batches):
        # Mergeable Misra-Gries summary (Agarwal et al.): per Arrow
        # batch, exact value_counts (vectorized), merge into the running
        # summary, then reduce back to m counters by subtracting the
        # (m+1)-th largest count and dropping non-positives — the
        # standard merge rule that preserves the MG error bound
        # (<= n_task/(m+1)), hence the heavy-key containment guarantee.
        counters: dict[int, int] = {}
        for pdf in batches:
            for k, c in pdf["user_id"].value_counts().items():
                counters[int(k)] = counters.get(int(k), 0) + int(c)
            if len(counters) > _HH_M:
                d = sorted(counters.values(), reverse=True)[_HH_M]
                counters = {
                    k: c - d for k, c in counters.items() if c > d
                }
        yield pd.DataFrame({"user_id": list(counters)})

    candidates = (
        ev.mapInPandas(spacesaving, "user_id long").distinct()
    )

    # Runtime certification of the containment guarantee (ADVICE r3): a key
    # missing from every task's MG summary has global count <= n/(m+1), so
    # the candidate-based top-k is provably exact iff the k-th recounted
    # candidate count strictly exceeds that bound. Certification is ONE
    # bounded action (r4 verdict nit 2 folded the old extra ev.count()):
    # the recount groups on `candidate-or-NULL`, so non-candidate mass
    # lands in a single NULL bucket, the shuffle stays at <= |candidates|+1
    # keys (map-side combine does the heavy lifting), and n = sum of all
    # bucket counts ships on each of the k collected rows via a window sum
    # over that tiny aggregate. When the bound fails (flat distribution,
    # high cardinality), fall back to the exact group-by — correctness
    # never depends on data luck.
    marked = ev.join(
        F.broadcast(candidates.withColumn("__cand", F.lit(True))),
        "user_id",
        "left",
    )
    bucket_counts = marked.groupBy(
        F.when(F.col("__cand"), F.col("user_id")).alias("cand_key")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    certified = (
        bucket_counts.withColumn(
            # bounded-global-window: <= |candidates|+1 rows (MG summary)
            "n_total", F.sum("n_events").over(Window.partitionBy())
        )
        .filter(F.col("cand_key").isNotNull())
        .orderBy(F.desc("n_events"), F.asc("cand_key"))
        .limit(_HH_K)
        .select(
            F.col("cand_key").alias("user_id"), "n_events", "n_total"
        )
    )
    top_rows = certified.collect()
    kth = min((r["n_events"] for r in top_rows), default=0)
    n_total = top_rows[0]["n_total"] if top_rows else 0
    if len(top_rows) == _HH_K and kth * (_HH_M + 1) > n_total:
        # Return the clean production plan (semi-join recount, no window):
        # the certified answer is provably the exact top-k.
        return (
            ev.join(F.broadcast(candidates), "user_id", "left_semi")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy(F.desc("n_events"), F.asc("user_id"))
            .limit(_HH_K)
        )
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(_HH_K)
    )
