"""Window functions: SURVEY.md §2.5 Q31-Q36.

The reference repo has no code (SURVEY.md §0); these are the windowed
operators an ETL + analytics engine needs: keep-first dedupe, top-k per
group, lag/lead gaps, running and time-range frames, ntile/first/last.

Scale posture: every window here is partitioned by a real key (user_id,
c_custkey, c_nationkey, segment) — ONE shuffle on the partition key, sort
within partitions, no global single-partition window anywhere. Every
orderBy carries a unique tie-break key (event_id / order key) so results
are deterministic and hash-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Q31 — row_number keep-first dedupe (the canonical ETL dedupe)
# --------------------------------------------------------------------------
@register(
    "z10631_keepfirst_dedupe",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
    FROM (SELECT user_id, event_type, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="Keep-first dedupe: earliest event per (user_id, event_type), "
    "event_id tie-break. One shuffle on the dedupe key; this exact shape "
    "is the 100 TB exact-dedup plan (and Q59's engine) (SURVEY §2.5 Q31).",
)
def z10631_keepfirst_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# --------------------------------------------------------------------------
# Q32 — rank / dense_rank top-k per group
# --------------------------------------------------------------------------
@register(
    "z10632_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, price_rank
    FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                 DENSE_RANK() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC) AS price_rank
          FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE price_rank <= 3
    """,
    doc="Top-3 orders by price per market segment via dense_rank (ties all "
    "kept -> result is a deterministic SET even without a tie-break). "
    "Shuffles once on segment after a broadcast-able customer join "
    "(SURVEY §2.5 Q32).",
)
def z10632_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("price_rank", F.dense_rank().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "price_rank")
    )


# --------------------------------------------------------------------------
# Q33 — lag / lead (inter-event gaps)
# --------------------------------------------------------------------------
@register(
    "z10633_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           date_diff('microsecond', prev_ts, ts)  AS gap_from_prev_us,
           date_diff('microsecond', ts, next_ts)  AS gap_to_next_us
    FROM (SELECT user_id, event_id, event_type, ts,
                 LAG(ts)  OVER w AS prev_ts,
                 LEAD(ts) OVER w AS next_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    """,
    doc="lag/lead inter-event gaps per user (first/last rows keep NULL "
    "gaps). Sessionization building block (SURVEY §2.5 Q33).",
)
def z10633_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_from_prev_us"
        ),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "gap_to_next_us"
        ),
    )


# --------------------------------------------------------------------------
# Q34 — running aggregate (rows frame)
# --------------------------------------------------------------------------
@register(
    "z10634_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_spent
    FROM orders
    """,
    doc="Cumulative revenue per customer in order-date order (rows frame, "
    "orderkey tie-break). Decimal accumulation keeps the running sum "
    "bit-stable across engines (SURVEY §2.5 Q34).",
)
def z10634_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("cum_spent"),
    )


# --------------------------------------------------------------------------
# Q35 — range frame (time-based trailing window)
# --------------------------------------------------------------------------
@register(
    "z10635_range_frame",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_7d_events,
           MAX(value) OVER w AS trailing_7d_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
    doc="7-day trailing count+max per user via a RANGE frame over epoch "
    "microseconds (identical frame boundaries in both engines; count/max "
    "are tie-order independent) (SURVEY §2.5 Q35).",
)
def z10635_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("trailing_7d_events"),
        F.max("value").over(w).alias("trailing_7d_max"),
    )


# --------------------------------------------------------------------------
# Q36 — ntile / first_value / last_value
# --------------------------------------------------------------------------
@register(
    "z10636_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS balance_quartile,
           FIRST_VALUE(c_name) OVER w AS richest_in_nation,
           LAST_VALUE(c_name)  OVER w AS poorest_in_nation
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Quartile-within-nation plus richest/poorest names via "
    "first/last_value over an explicit full frame (the default frame "
    "would make last_value = current row in both engines) "
    "(SURVEY §2.5 Q36).",
)
def z10636_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w_ntile = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w_ntile).alias("balance_quartile"),
        F.first("c_name").over(w_full).alias("richest_in_nation"),
        F.last("c_name").over(w_full).alias("poorest_in_nation"),
    )


# --------------------------------------------------------------------------
# Y53 — rank-function kit: percent_rank / cume_dist / nth_value
# --------------------------------------------------------------------------
@register(
    "z117196_rank_kit",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS price_pct_rank,
           round(cume_dist() OVER w, 6) AS price_cume_dist,
           nth_value(o_orderkey, 3) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS third_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="The remaining SQL rank functions in one pass: percent_rank and "
    "cume_dist (relative position within the priority class) plus "
    "nth_value over an explicit full frame (default frame would stop "
    "at the current row before the 3rd element exists, as in q36). "
    "One hash-partition shuffle on o_orderpriority serves all three "
    "window specs — same partition key + compatible sort, so Catalyst "
    "plans a single Exchange+Sort and stacks the Window operators. "
    "Order is made total with the o_orderkey tiebreak; the relative "
    "ranks are doubles, rounded 6dp on both sides (SURVEY §2.5).",
)
def z117196_rank_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
        F.nth_value("o_orderkey", 3).over(w_full).alias("third_cheapest"),
    )
