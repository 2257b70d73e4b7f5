"""Core scans, projections, filters, and basic aggregations.

SURVEY.md §2.1 Q01-Q02, §2.2 Q03-Q07, §2.4 Q19-Q21. The reference repo has
no code (SURVEY.md §0); these implement the scan/filter/project/aggregate
surface an EPrints->Hyku ETL needs, Spark-first.

Scale posture: every query here is a single scan (+ one shuffle for the
group-bys). Filters and projections are expressed declaratively so Catalyst
pushes them into the parquet reader (PushedFilters / ReadSchema — asserted
in tests/test_plans.py); aggregations get map-side partial aggregation
automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def dec_sum(col: Column | str, alias: str, typ: str = "decimal(18,2)") -> Column:
    """SUM computed in decimal (exact, partitioning-order independent) and
    cast to double — both Spark and the DuckDB oracle then yield
    bit-identical doubles. The standard money-aggregate idiom here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(typ)).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Q01 — full parquet scan + count/checksum
# --------------------------------------------------------------------------
@register(
    "q901_scan_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_orderkey AS HUGEINT)) AS BIGINT) AS key_checksum,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_checksum
    FROM lineitem
    """,
    doc="Full table scan with count and checksums (SURVEY §2.1 Q01).",
)
def q901_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # Accumulate in decimal(38,0) (no silent long-wrap at 100x scale;
        # DuckDB widens to HUGEINT the same way) but EMIT a BIGINT: the sum
        # of keys fits a long at any real scale (sum < 2^63 up to ~10^9 rows
        # of 10-digit keys), and decimal output columns hash differently per
        # engine in the driver's canonicalizer — this was the only red
        # driver row in round 2. Final-schema decimals are now banned
        # fleet-wide (tests/test_registry.py).
        F.sum(F.col("l_orderkey").cast("decimal(38,0)"))
        .cast("long")
        .alias("key_checksum"),
        dec_sum("l_quantity", "qty_checksum"),
    )


# --------------------------------------------------------------------------
# Q02 — projected + filtered scan (pushdown showcase)
# --------------------------------------------------------------------------
@register(
    "q902_scan_pushdown",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    doc="Projection+filter pushed to the parquet scan (SURVEY §2.1 Q02).",
)
def q902_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Q03 — compute + alias projection (ETL field mapping)
# --------------------------------------------------------------------------
@register(
    "q903_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged_price
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    doc="Computed projection; row-level IEEE arithmetic is deterministic "
    "on both engines so no rounding is needed (SURVEY §2.2 Q03).",
)
def q903_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (F.lit(1) + F.col("l_tax"))).alias("charged_price"),
    )


# --------------------------------------------------------------------------
# Q04 — compound predicate + global agg (TPC-H Q6 shape)
# --------------------------------------------------------------------------
@register(
    "q904_compound_predicate",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="AND-of-ranges predicate + global aggregate (SURVEY §2.2 Q04).",
)
def q904_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(8,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q05 — IN / LIKE / NULL-check predicates (vocabulary filtering)
# --------------------------------------------------------------------------
@register(
    "q905_in_like_null",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_type LIKE 'PROMO%'
      AND p_name IS NOT NULL
    """,
    doc="IN-list, LIKE prefix, and null-check predicates (SURVEY §2.2 Q05).",
)
def q905_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
            & F.col("p_type").like("PROMO%")
            & F.col("p_name").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_type")
    )


# --------------------------------------------------------------------------
# Q06 — distinct projection
# --------------------------------------------------------------------------
@register(
    "q906_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    doc="Distinct pair projection; planner uses hash aggregate (SURVEY §2.2 Q06).",
)
def q906_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --------------------------------------------------------------------------
# Q07 — conditional projection (CASE WHEN vocabulary mapping)
# --------------------------------------------------------------------------
@register(
    "q907_case_when",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS urgency,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY urgency
    """,
    doc="In-expression vocabulary mapping — the ETL 'controlled vocabulary' "
    "pattern (SURVEY §1.1) as CASE WHEN (SURVEY §2.2 Q07).",
)
def q907_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("urgency")
    )
    return orders.groupBy(urgency).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
    )


# --------------------------------------------------------------------------
# Q19 — TPC-H Q1-shaped multi-aggregate group-by (the flagship query)
# --------------------------------------------------------------------------
@register(
    "q10619_groupby_multi_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM((CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(8,2))))
                    * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash group-by with 8 aggregates (partial+final combine is automatic"
    " in Spark). Averages are exact-decimal sums divided by count so both "
    "engines produce bit-identical doubles (SURVEY §2.4 Q19).",
)
def q10619_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    tax = F.col("l_tax").cast("decimal(8,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum((price * (F.lit(1) - disc)) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Q20 — global (no-key) aggregate
# --------------------------------------------------------------------------
@register(
    "q10620_global_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
           CAST(MAX(l_shipdate) AS DATE) AS max_shipdate,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_discount
    FROM lineitem
    """,
    doc="Global aggregate, no grouping key (SURVEY §2.4 Q20).",
)
def q10620_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return li.agg(
        cnt.alias("n_rows"),
        dec_sum("l_quantity", "total_qty"),
        F.min("l_shipdate").cast("date").alias("min_shipdate"),
        F.max("l_shipdate").cast("date").alias("max_shipdate"),
        (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / cnt).alias(
            "avg_discount"
        ),
    )


# --------------------------------------------------------------------------
# Q21 — exact count-distinct per group
# --------------------------------------------------------------------------
@register(
    "q10621_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact distinct aggregation (Spark plans an Expand + two-phase "
    "aggregate) (SURVEY §2.4 Q21).",
)
def q10621_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Y47 — single-pass column profiler (data-quality summary)
# --------------------------------------------------------------------------
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "z139190_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS mean_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           MIN(l_extendedprice), MAX(l_extendedprice),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           MIN(l_discount), MAX(l_discount),
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_tax) AS BIGINT),
           CAST(COUNT(DISTINCT l_tax) AS BIGINT),
           MIN(l_tax), MAX(l_tax),
           CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_tax)
    FROM lineitem
    """,
    doc="Column profiler: per-column row/non-null/distinct counts, "
    "min/max, and a decimal-exact mean for every numeric lineitem "
    "measure — the data-quality summary an ETL tool prints before a "
    "migration (EPrints exports are stringly-typed; profiling is how "
    "coercion rules get chosen, SURVEY §1.1). The oracle scans once "
    "per column (4 scans); the Spark plan computes all columns' "
    "aggregates in TWO column-count-independent passes — one 20-agg "
    "plain pass and one distinct-counts pass (Spark's mixed-distinct "
    "plan would drag every plain-agg buffer through an Expand x5; "
    "split, measured 2x faster — r15), broadcast-joined 1-row x "
    "1-row, then unpivoted with stack(). Swap to "
    "approx_count_distinct at scale for a sketch-mergeable one-pass "
    "variant (q22 trade).",
)
def z139190_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Two single-row aggregates joined back, NOT one mixed aggregate
    # (r15): with FOUR distinct columns Spark plans the mixed form as
    # one Expand x5 (rows x (n_distinct_cols + 1)) that drags all 20
    # plain-agg buffers through the expanded rows — measured 4.05 s at
    # sf0.1 vs 1.15 s (plain half) + 1.00 s (distinct half) run
    # separately; the split form computes identical exact values for
    # a broadcast join of two 1-row tables. Still column-count-
    # independent at 100 TB: one plain pass + one Expand pass, each
    # pruned to the profiled columns; swap countDistinct for
    # approx_count_distinct at scale for the sketch-mergeable one-pass
    # variant (q22 trade).
    plain = []
    for c in _PROFILE_COLS:
        plain += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.count(c).cast("long").alias(f"{c}__nn"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            (
                F.sum(F.col(c).cast("decimal(18,6)")).cast("double")
                / F.count(c)
            ).alias(f"{c}__mean"),
        ]
    nd = [
        F.countDistinct(c).cast("long").alias(f"{c}__nd")
        for c in _PROFILE_COLS
    ]
    wide = li.agg(*plain).crossJoin(F.broadcast(li.agg(*nd)))
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__min, {c}__max, {c}__mean"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col, n_rows, n_non_null, n_distinct, min_val, max_val, mean_val)"
    )


# --------------------------------------------------------------------------
# Y48 — referential-integrity audit (FK orphan counts)
# --------------------------------------------------------------------------
@register(
    "z117191_ri_audit",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    """,
    doc="Referential-integrity audit: orphan counts for every child->parent "
    "FK edge in the star schema — the 'every subject code resolves' "
    "check of the EPrints->Hyku domain (SURVEY §1.1) generalized. Each "
    "edge is one left ANTI join against the parent's key projection, "
    "with NO mandatory broadcast hint: parents here include orders and "
    "customer, which scale with SF (a forced build of orders' keys OOMs "
    "at the 100 TB mandate) — AQE broadcasts the key projections that "
    "actually fit (all of them, at fixture scale) and sort-merges the "
    "rest. Each edge is "
    "aggregated to a single (fk, n_child, n_orphans) row and unioned. "
    "Anti joins prune to the parent's KEY column only (ReadSchema "
    "verified by the pushdown lint), so the audit reads each parent "
    "table's key bytes, not its payload.",
)
def z117191_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def edge(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent.select(parent_key),
            child[child_key] == F.col(parent_key),
            "left_anti",
        )
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans")
                )
            )
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )

    return (
        edge(
            "orders.o_custkey->customer",
            orders,
            "o_custkey",
            load_table(spark, sf_dir, "customer"),
            "c_custkey",
        )
        .unionAll(
            edge(
                "lineitem.l_orderkey->orders",
                li,
                "l_orderkey",
                orders.select("o_orderkey"),
                "o_orderkey",
            )
        )
        .unionAll(
            edge(
                "lineitem.l_partkey->part",
                li,
                "l_partkey",
                load_table(spark, sf_dir, "part"),
                "p_partkey",
            )
        )
        .unionAll(
            edge(
                "lineitem.l_suppkey->supplier",
                li,
                "l_suppkey",
                load_table(spark, sf_dir, "supplier"),
                "s_suppkey",
            )
        )
    )
