"""Round-5 batch A: the remaining TPC-H query shapes (Q2/Q4/Q8/Q9/Q10/
Q15/Q16/Q18/Q19/Q20/Q21/Q22), adapted to this fixture's reduced schema.
Rounds 1-4 covered Q1/Q3/Q5/Q6/Q7/Q12/Q13/Q14/Q17; with this module every
TPC-H access shape has a registered, oracle-paired composite. The point
is the DECORRELATION catalogue: each of these is a correlated-subquery
form (scalar subquery, EXISTS, NOT EXISTS, IN, aggregate-in-predicate)
re-expressed as the join/window shape a 100 TB Spark plan wants —
aggregate-then-join-back, semi/anti joins, window rank-1, one-row
broadcast scalars — instead of per-row subquery execution.

Schema adaptations (no partsupp/commitdate/receiptdate/phone in the
fixture): supply cost ~ 60% of p_retailprice; "late delivery" ~ a
quantity-capped line; customer country code ~ c_nationkey. The SHAPE
(which decorrelation, which join strategy, where the shuffle lands) is
the thing under test, and is unchanged by these substitutions.

Cross-engine hash discipline (q_r4.py rules): money in DECIMAL(18,2)
end-to-end, cast DOUBLE only at output; ratios are one IEEE division of
two exactly-computed decimals; counts BIGINT; every computed column
aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# Column factories, not module-level constants: building a Column needs a
# live JVM, and this module must import cleanly without a SparkSession.
def _price():
    return F.col("l_extendedprice").cast("decimal(18,2)")


def _disc():
    return F.col("l_discount").cast("decimal(8,2)")


def _qty():
    return F.col("l_quantity").cast("decimal(18,2)")


# --------------------------------------------------------------------------
# Q10 — min-cost supplier (TPC-H Q2 shape)
# --------------------------------------------------------------------------
@register(
    "z128310_min_cost_supplier",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         cand AS (
           SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                  s.s_acctbal, n.n_name,
                  ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                     ORDER BY s.s_acctbal DESC, s.s_suppkey)
                    AS rk
           FROM pairs pr
           JOIN part p ON p.p_partkey = pr.l_partkey AND p.p_size < 10
           JOIN supplier s ON s.s_suppkey = pr.l_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey
                        AND r.r_name = 'EUROPE'
         )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM cand WHERE rk = 1
    """,
    doc="TPC-H Q2 shape (best supplier per part). The classic form is a "
    "correlated MIN subquery per part; the scale form is ONE window "
    "rank over the part-supplier candidate set: distinct "
    "(partkey, suppkey) pairs from the 100 TB fact table (map-side "
    "combine makes distinct cheap), dims broadcast onto the pairs, "
    "then row_number()=1 per part — no per-part subquery, one shuffle "
    "on partkey. No partsupp table in the fixture, so 'best' = highest "
    "account balance among the part's European shippers (ties by "
    "suppkey; the decorrelation shape is identical).",
)
def z128310_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            "n_name",
        )
    )


# --------------------------------------------------------------------------
# Q11 — order-priority EXISTS check (TPC-H Q4 shape)
# --------------------------------------------------------------------------
@register(
    "z128311_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity >= 48)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS decorrelation). The correlated EXISTS "
    "becomes a LEFT SEMI join: lineitem is pre-filtered at the scan "
    "(quantity>=48 pushes down), the semi join deduplicates matches "
    "for free (no DISTINCT pass), and only then does the priority "
    "count aggregate. No commitdate/receiptdate in the fixture, so "
    "'late line' ~ a quantity-capped line — same shape.",
)
def z128311_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    flagged = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 48
    )
    return (
        orders.join(
            flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q12 — national market share (TPC-H Q8 shape)
# --------------------------------------------------------------------------
@register(
    "z138312_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(8,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                       AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '2000-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape (market share): one supplier nation's share of a "
    "region's import revenue per year. The share is a conditional "
    "decimal sum over the SAME aggregation as the total — one shuffle "
    "produces numerator and denominator together, then a single IEEE "
    "division (never a join of two separate aggregates). The nation "
    "dim joins BOTH legs (customer side filters via region, supplier "
    "side labels the numerator) — two broadcasts of the same table "
    "under different roles.",
)
def z138312_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "2000-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    rev = _price() * (F.lit(1) - _disc())
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(region),
            F.col("n1.n_regionkey") == region.r_regionkey,
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("n2.n_name") == "NATION_3", rev).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q13 — product-type profit (TPC-H Q9 shape)
# --------------------------------------------------------------------------
@register(
    "z138313_nation_profit",
    oracle="""
    SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
             AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2)))
                    - CAST(0.6 AS DECIMAL(8,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
               AND p.p_name LIKE 'red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, 2
    """,
    doc="TPC-H Q9 shape (profit by supplier nation and year, parts "
    "filtered by name pattern). The LIKE 'red%' prunes part BEFORE its "
    "broadcast; profit = revenue minus cost stays in one decimal "
    "expression so the per-group sum is exact. No partsupp in the "
    "fixture: supply cost ~ 60% of p_retailprice per unit. Group keys "
    "come from two different dimension legs (nation via supplier, "
    "year via orders) — the aggregation happens after a 4-way join "
    "whose only shuffled edge is lineitem-orders.",
)
def z138313_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cost = (
        F.lit(0.6).cast("decimal(8,2)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * _qty()
    )
    profit = _price() * (F.lit(1) - _disc()) - cost
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q14 — returned-item reporting (TPC-H Q10 shape)
# --------------------------------------------------------------------------
@register(
    "z138314_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (top-20 customers by returned-revenue in a "
    "half-year). The returnflag equality and the date range both push "
    "to their scans; revenue aggregates decimal-exact so the top-20 "
    "cut is deterministic (ties broken by custkey); the final ORDER "
    "BY + LIMIT runs as TakeOrdered, never a global sort.",
)
def z138314_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_price() * (F.lit(1) - _disc()))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (TPC-H Q15 shape)
# --------------------------------------------------------------------------
@register(
    "z138315_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE)
             AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape (supplier(s) with maximum quarterly revenue). "
    "The scalar MAX subquery decorrelates to an aggregate-then-"
    "join-back: per-supplier decimal revenue once, its one-row MAX "
    "broadcast, and an EQUI join on the exact decimal value — "
    "broadcast hash join on the revenue value, not a nested loop, and "
    "exact because the money never became a float before the "
    "comparison. Ties (multiple max suppliers) survive, matching the "
    "SQL semantics.",
)
def z138315_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_price() * (F.lit(1) - _disc())).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        rev.join(
            F.broadcast(best), rev.total_rev == best.best_rev, "inner"
        )
        .join(supp, rev.supplier_no == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (TPC-H Q16 shape)
# --------------------------------------------------------------------------
@register(
    "z138316_supplier_variety",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10)
      AND pr.l_suppkey IN (SELECT s_suppkey FROM ok_supp)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier variety per part attribute, excluding "
    "flagged suppliers). The NOT-IN-complaints subquery becomes a LEFT "
    "SEMI join against the good-supplier set (fixture: non-negative "
    "balance); the part-supplier pair set is distinct-ed fact-side "
    "first (map-side combine), and the brand/size predicates ride the "
    "broadcast part dim. COUNT(DISTINCT suppkey) per 3-key group is "
    "the one genuine shuffle.",
)
def z138316_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10)
    )
    ok_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0
    )
    return (
        pairs.join(
            ok_supp, pairs.l_suppkey == ok_supp.s_suppkey, "left_semi"
        )
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
        )
    )


# --------------------------------------------------------------------------
# Q17 — large-volume orders (TPC-H Q18 shape)
# --------------------------------------------------------------------------
@register(
    "z138317_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape (orders whose total quantity clears a "
    "threshold). The IN-(grouped-HAVING-subquery) form decorrelates "
    "to aggregate-first: lineitem groups on its own join key "
    "(orderkey), the HAVING prunes ~99% of groups BEFORE any join, "
    "and only the surviving keys meet orders/customer. Aggregating "
    "before joining is the difference between shuffling the 100 TB "
    "fact table once versus joining it wide first.",
)
def z138317_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_qty()).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q18 — disjunctive predicate revenue (TPC-H Q19 shape)
# --------------------------------------------------------------------------
@register(
    "z138318_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (three-armed disjunctive predicate spanning "
    "both join sides). Catalyst cannot push the whole OR to either "
    "scan, but it CAN and must derive the single-side implications: "
    "part prunes to the three brands (IN-list pushdown from the OR), "
    "lineitem prunes to quantity 1-30, and the exact disjunction "
    "evaluates as the join residual. The part side stays a broadcast. "
    "This is the canonical test that OR-predicate inference survives "
    "the optimizer.",
)
def z138318_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(arm1 | arm2 | arm3).agg(
        F.sum(_price() * (F.lit(1) - _disc())).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q19 — part-promotion suppliers (TPC-H Q20 shape)
# --------------------------------------------------------------------------
@register(
    "z138319_part_promotion",
    oracle="""
    WITH small_parts AS (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%'),
         heavy AS (
           SELECT l_suppkey,
                  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM small_parts)
           GROUP BY l_suppkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400
         )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(h.qty AS DOUBLE) AS small_part_qty
    FROM supplier s
    JOIN heavy h ON h.l_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
    doc="TPC-H Q20 shape (suppliers moving large volumes of a part "
    "family — nested IN subqueries three deep in the classic form). "
    "Decorrelated inside-out: the part-name family is a broadcast "
    "SEMI join onto lineitem (no row expansion), the per-supplier "
    "quantity aggregates fact-side with HAVING pruning before any "
    "dimension join, and supplier+nation attach to the tiny survivor "
    "set. Each nesting level becomes one relational operator; nothing "
    "re-executes per outer row.",
)
def z138319_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    heavy = (
        li.join(
            small_parts,
            li.l_partkey == small_parts.p_partkey,
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_qty()).alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return (
        supp.join(heavy, heavy.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("qty").cast("double").alias("small_part_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q20 — sole-fault supplier (TPC-H Q21 shape)
# --------------------------------------------------------------------------
@register(
    "z138320_sole_fault_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_fault,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS fault_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order po
    JOIN supplier s ON s.s_suppkey = po.fault_supp
    WHERE po.n_supp >= 2 AND po.n_fault = 1
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (the EXISTS + NOT-EXISTS double correlation: "
    "multi-supplier orders where exactly one supplier faulted). Both "
    "correlated subqueries collapse into ONE aggregation over "
    "lineitem grouped by its own orderkey: distinct-supplier count "
    "(the EXISTS arm), distinct-faulting-supplier count (the "
    "NOT-EXISTS arm, =1), and the faulter's identity via conditional "
    "MIN — exact because n_fault=1 makes MIN the unique faulter. One "
    "shuffle on orderkey replaces two correlated probes of the 100 TB "
    "fact table; fixture uses returnflag R as the fault marker "
    "(no receiptdate).",
)
def z138320_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    is_r = F.col("l_returnflag") == "R"
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("n_fault"),
        F.min(F.when(is_r, F.col("l_suppkey"))).alias("fault_supp"),
    )
    return (
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_fault") == 1)
        )
        .join(supp, F.col("fault_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q21 — dormant high-balance customers (TPC-H Q22 shape)
# --------------------------------------------------------------------------
@register(
    "z138321_dormant_customers",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= DATE '2000-01-01')
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    CROSS JOIN cutoff
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > cutoff.avg_bal
      AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22 shape (high-balance customers with no recent orders; "
    "scalar AVG subquery + NOT EXISTS). The scalar average is a "
    "one-row aggregate broadcast-cross-joined onto customer (decimal "
    "sum / bigint count -> one IEEE division, bit-identical across "
    "engines); the NOT EXISTS is a LEFT ANTI join against the "
    "recent-orderer key set. Fixture has no phone column, so the "
    "cntrycode grouping becomes the nation dim, and 'never ordered' "
    "becomes 'no order since 2000' (every sf0.01 customer has SOME "
    "order).",
)
def z138321_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    cutoff = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
