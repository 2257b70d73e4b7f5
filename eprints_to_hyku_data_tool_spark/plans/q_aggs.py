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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
from .q_core import dec_sum


# --------------------------------------------------------------------------
# Q22 — approx count-distinct (HLL) with a checkable tolerance verdict
# --------------------------------------------------------------------------
@register(
    "q22_approx_count_distinct",
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
def q22_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "z23_rollup",
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
def q23_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "z24_cube",
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
def q24_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "z25_bulkrax_fold",
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
def z25_bulkrax_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
    "z26_pivot",
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
    "deterministic plan at scale (no pre-pass to discover values) "
    "(SURVEY §2.4 Q26).",
)
def q26_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pivoted = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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
    "z27_percentiles",
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
    "hashable) — exercised in tests (SURVEY §2.4 Q27).",
)
def q27_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
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
    "z28_stats",
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
def q28_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "z29_conditional_agg",
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
def q29_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "z30_mixed_distinct",
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
def q30_mixed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "y46_grouping_sets",
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
def y46_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
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
