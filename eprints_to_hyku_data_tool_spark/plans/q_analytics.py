"""Product-analytics macro-operators over the events stream: funnel
analysis and cohort retention (assignment mandate breadth beyond
SURVEY.md §2 — the aggregation/window machinery applied to the two
canonical event-analytics questions).

Both are oracle-paired; timestamps compare exactly (integer microsecond
instants on both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

FUNNEL_STEP_HOURS = 24


# --------------------------------------------------------------------------
# X26 — ordered funnel (view -> click -> purchase, each within 24h)
# --------------------------------------------------------------------------
@register(
    "x26_funnel",
    oracle=f"""
    WITH v AS (SELECT user_id,
                      MIN(CASE WHEN event_type='view' THEN ts END) AS t_view
               FROM events GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type='click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL {FUNNEL_STEP_HOURS} HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type='purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL {FUNNEL_STEP_HOURS} HOUR
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS completed
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    doc="Ordered three-step funnel (first view -> first qualifying click "
    "within 24h -> first qualifying purchase within 24h) per user. The "
    "oracle uses the textbook three-CTE join chain (three shuffles); "
    "the Spark plan instead STACKS conditional window minima over the "
    "same user_id partition — each step's predicate references the "
    "previous step's column, Catalyst reuses one exchange for all three "
    "Window operators plus the final per-user aggregate: a single "
    "shuffle end-to-end at any scale (plan-asserted in "
    "tests/test_plans.py). Fixture: 150 users -> 60 clicked -> 25 "
    "completed (funnel/sessionization mandate).",
)
def x26_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    W = Window.partitionBy("user_id")
    step = F.expr(f"INTERVAL {FUNNEL_STEP_HOURS} HOURS")
    e1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(W),
    )
    e2 = e1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + step),
                F.col("ts"),
            )
        ).over(W),
    )
    e3 = e2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + step),
                F.col("ts"),
            )
        ).over(W),
    )
    return e3.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
        F.max(
            F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
        )
        .cast("int")
        .alias("completed"),
    )


# --------------------------------------------------------------------------
# X27 — cohort retention (first-purchase-day cohorts x day offset)
# --------------------------------------------------------------------------
@register(
    "x27_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
               FROM events WHERE event_type='purchase' GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS activity_day
          FROM events WHERE event_type='purchase')
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.activity_day) AS BIGINT)
             AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM f JOIN a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users grouped by first-purchase day, "
    "counted on every subsequent day they purchase again. Shuffles: "
    "per-user first-purchase agg, distinct (user, day) activity, one "
    "user-keyed join, final (cohort, offset) count-distinct — all keyed "
    "on bounded-cardinality columns; the matrix is O(days^2) regardless "
    "of event volume (retention mandate).",
)
def x27_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    f = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    a = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("activity_day")
    ).distinct()
    return (
        f.join(a, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("activity_day", "cohort_day")
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
