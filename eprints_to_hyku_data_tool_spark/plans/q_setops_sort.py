"""Sorts, limits, top-k, and set operations: SURVEY.md §2.6 Q37-Q39, §2.7 Q40-Q42.

The reference repo has no code (SURVEY.md §0); these are the ordering and
set-reconciliation operators of the migration domain — stable output files,
QA pagination, merged batches, and the "not yet migrated" delta report.

Scale posture: Q38/Q39 compile to TakeOrderedAndProject (per-partition
top-k, then a single small merge — no global sort materialization). Q37
materializes a global position via the distributed two-phase scheme in
functions/ordering.py (range partition -> local ranks -> broadcast
offsets), never a single-partition window. Set ops are key-only
projections before the shuffle, so the exchanged payload is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .q_core import dec_sum
from .registry import register


# --------------------------------------------------------------------------
# Q37 — multi-key sort with null ordering
# --------------------------------------------------------------------------
@register(
    "z1210637_multikey_sort",
    oracle="""
    SELECT o_orderkey, order_date, price_or_null,
           ROW_NUMBER() OVER (ORDER BY order_date DESC,
                              price_or_null ASC NULLS LAST,
                              o_orderkey) AS position
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                 CASE WHEN o_orderstatus = 'P' THEN NULL
                      ELSE o_totalprice END AS price_or_null
          FROM orders)
    """,
    doc="Multi-key sort (DESC date, ASC-nulls-last price, key tie-break) "
    "with the total order materialized as a position column — the "
    "order-insensitive hash can't see bare sort order otherwise. "
    "Positions come from the distributed two-phase scheme "
    "(functions.ordering.with_global_position: range partition -> local "
    "ranks -> broadcast offsets), NOT a single-partition global window "
    "(SURVEY §2.6 Q37).",
)
def z1210637_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ordering import with_global_position

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("price_or_null"),
    )
    return with_global_position(
        orders,
        [
            F.desc("order_date"),
            F.asc_nulls_last("price_or_null"),
            F.asc("o_orderkey"),
        ],
    )


# --------------------------------------------------------------------------
# Q38 — global top-k (TakeOrderedAndProject)
# --------------------------------------------------------------------------
@register(
    "z10638_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-10 by price (orderkey tie-break). Spark plans "
    "TakeOrderedAndProject: per-partition heaps then one tiny merge — "
    "no global sort at any scale (SURVEY §2.6 Q38).",
)
def z10638_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q39 — limit / offset pagination
# --------------------------------------------------------------------------
@register(
    "z10639_limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 25 OFFSET 100
    """,
    doc="Keyset-deterministic pagination: page 5 of 25 over the unique "
    "order key (SURVEY §2.6 Q39).",
)
def z10639_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q40 — UNION ALL + dedupe (merging export batches)
# --------------------------------------------------------------------------
@register(
    "z10640_union",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY o_custkey
    """,
    doc="UNION ALL of two export slices, then a group-collapse — covers "
    "both the all and distinct union semantics in one checkable result "
    "(a customer in both slices counts its multiplicity) "
    "(SURVEY §2.7 Q40).",
)
def z10640_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        urgent.unionByName(finished)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


# --------------------------------------------------------------------------
# Q41 — INTERSECT (reconciliation)
# --------------------------------------------------------------------------
@register(
    "z10641_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT of two id sets (BUILDING-segment customers that also "
    "have a finished order) — distinct semantics on both engines "
    "(SURVEY §2.7 Q41).",
)
def z10641_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    f_holders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(f_holders)


# --------------------------------------------------------------------------
# Q42 — EXCEPT (the "not yet migrated" delta report)
# --------------------------------------------------------------------------
@register(
    "z10642_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="EXCEPT: source ids minus loaded ids = the migration delta report "
    "(SURVEY §2.7 Q42). Same result set as the Q13 anti join, via the "
    "set-operator plan (left-anti under the hood after distinct).",
)
def z10642_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    all_cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    with_orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return all_cust.subtract(with_orders)


# --------------------------------------------------------------------------
# Y61 — unpivot / melt (wide -> long) + per-metric profile
# --------------------------------------------------------------------------
@register(
    "z117235_unpivot_melt",
    oracle="""
    SELECT metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
           round(MIN(val), 6) AS lo,
           round(MAX(val), 6) AS hi
    FROM (UNPIVOT lineitem
          ON l_quantity, l_discount, l_tax
          INTO NAME metric VALUE val)
    GROUP BY metric
    """,
    doc="Wide->long reshaping through the NATIVE DataFrame.unpivot API "
    "(Spark 3.4+; the relational dual of z26's pivot): three numeric "
    "lineitem measures melt into (metric, val) rows — an Expand node, "
    "map-side, zero shuffle — then one partial-agg shuffle profiles "
    "each metric. Same Expand machinery as rollup/cube; metric names "
    "are the source column names in both engines, sums in DECIMAL "
    "(fleet rule) (SURVEY §2.4 reshaping).",
)
def z117235_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(F.col("val"), "total", "decimal(18,6)"),
        F.round(F.min("val"), 6).alias("lo"),
        F.round(F.max("val"), 6).alias("hi"),
    )
