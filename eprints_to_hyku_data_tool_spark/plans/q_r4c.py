"""Round-4 closing batch: TPC-H-shaped reporting composites (overflow
tier, rotation candidates). Single-operator queries verify each relational
primitive in isolation; these multi-join reporting shapes verify that the
primitives COMPOSE — that Catalyst picks the broadcast/shuffle split we
expect when a fact table meets a dimension snowflake plus a correlated
aggregate, and that the decimal-exact money discipline survives a CASE
branch or a join-back.

Cross-engine hash discipline (same rules as q_r4.py):
- money is DECIMAL(18,2) end-to-end, cast to DOUBLE only at output;
- ratios are a single IEEE division of two exactly-computed decimals;
- counts are BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# --------------------------------------------------------------------------
# Y70 — ship-mode priority report (TPC-H Q12 composite)
# --------------------------------------------------------------------------


@register(
    "z128304_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linestatus = 'F'
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="The TPC-H Q12 composite shape (priority counting per line "
    "class), on this fixture's reduced lineitem schema: a fact-to-fact "
    "equi join (lineitem-orders) whose SELECTIVE side is the fact "
    "table — the linestatus equality plus the shipdate year prune "
    "lineitem BEFORE the join, so AQE sees a shrunken probe side. The "
    "CASE-over-priority split verifies conditional counting survives a "
    "join (z29 checks it standalone). Both predicates are scan-level — "
    "`PushedFilters` carries the equality and the shipdate range "
    "(reporting composite #4; overflow tier).",
)
def z128304_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Y71 — promotion revenue share (TPC-H Q14 composite)
# --------------------------------------------------------------------------


@register(
    "z128305_promo_revenue",
    oracle="""
    WITH agg AS (
        SELECT SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(8,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS total
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= DATE '1996-03-01'
          AND l.l_shipdate < DATE '1996-04-01'
    )
    SELECT CAST(promo AS DOUBLE) AS promo_revenue,
           CAST(total AS DOUBLE) AS total_revenue,
           CAST(CAST(100 * promo AS DOUBLE)
                / CAST(total AS DOUBLE) AS DOUBLE) AS promo_pct
    FROM agg
    """,
    doc="The TPC-H Q14 composite: one month of lineitem joined to part, "
    "with a LIKE-driven CASE inside a decimal SUM and a ratio output. "
    "part is dimension-sized (O(SF*200k) rows) so the join broadcasts; "
    "the shipdate range is pushed to the scan. promo_pct is one IEEE "
    "division of two exactly-summed decimals — the established "
    "bit-determinism idiom for ratio outputs (reporting composite #5; "
    "overflow tier).",
)
def z128305_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
            ).alias("promo"),
            F.sum(rev).alias("total"),
        )
    )
    return agg.select(
        F.col("promo").cast("double").alias("promo_revenue"),
        F.col("total").cast("double").alias("total_revenue"),
        (
            (F.col("promo") * F.lit(100)).cast("double")
            / F.col("total").cast("double")
        ).cast("double").alias("promo_pct"),
    )


# --------------------------------------------------------------------------
# Y72 — customer order-count distribution (TPC-H Q13 composite)
# --------------------------------------------------------------------------


@register(
    "z128306_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey,
               COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="The TPC-H Q13 composite: a left outer join whose JOIN CONDITION "
    "carries a residual filter on the right side (it must NOT become a "
    "post-join WHERE — that would turn the outer join inner and drop "
    "zero-order customers), then a two-level aggregation: orders per "
    "customer, then customers per order-count. COUNT(o_orderkey) "
    "counts non-null matches only, so never-matched customers land in "
    "the c_count=0 bucket. The second group-by is over a tiny domain "
    "(~tens of distinct counts) — partial aggregation collapses it "
    "map-side (reporting composite #6; overflow tier).",
)
def z128306_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & ~orders.o_orderpriority.isin("5-LOW", "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Y73 — small-quantity order audit (TPC-H Q17 composite)
# --------------------------------------------------------------------------


@register(
    "z128307_small_qty_audit",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
               COUNT(*) AS qty_n
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND p.p_size < 15
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * a.qty_n < a.qty_sum
    """,
    doc="The TPC-H Q17 composite: a correlated scalar aggregate "
    "(per-part average quantity) rewritten as aggregate-then-join-back "
    "— the standard decorrelation Catalyst cannot always do for you. "
    "The below-20%-of-average predicate is kept in EXACT integer/"
    "decimal form (qty * 5 * n < sum) instead of a float division, so "
    "the boundary rows classify identically in both engines. The "
    "brand/size filter prunes part to a sliver; the per-part "
    "average join is keyed on the same l_partkey as the probe — one "
    "shuffle key shared by both sides (reporting composite #7; "
    "overflow tier).",
)
def z128307_small_qty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    # Renamed key: both join inputs share the lineitem scan lineage, and a
    # raw l_partkey == l_partkey predicate is ambiguous (Spark warns it is
    # "trivially true" and falls back to dataset-id disambiguation).
    avg_qty = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    ).withColumnRenamed("l_partkey", "a_partkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    )
    probe = li.join(part, li.l_partkey == part.p_partkey)
    return (
        probe.join(
            avg_qty,
            probe.l_partkey == avg_qty.a_partkey,
        )
        .drop("a_partkey")
        .filter(qty * F.lit(5) * F.col("qty_n") < F.col("qty_sum"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Y74 — nation-pair volume shipping (TPC-H Q7 composite)
# --------------------------------------------------------------------------


@register(
    "z128308_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1995-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="The TPC-H Q7 composite: two fact-fact joins (lineitem-orders, "
    "orders-customer) with the nation dimension joined TWICE under "
    "different roles, and the symmetric nation-pair disjunction as a "
    "post-join residual — the one predicate shape no single-table "
    "pushdown can absorb, because it correlates columns from two "
    "different join branches. Both nation sides broadcast; the "
    "two-year shipdate range is scan-level. Grouping by a derived "
    "year column checks expression keys survive the composite "
    "(reporting composite #8; overflow tier).",
)
def z128308_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
