"""Event-time window operators, batch form: SURVEY.md §2.9 Q54-Q56.

The reference repo has no code (SURVEY.md §0); these are the event-time
aggregations of the streaming surface, expressed over the static `events`
table so they are oracle-checkable. The SAME logical shapes run as true
Structured Streaming queries in ..streaming.ops (file-source replay,
watermarks, state) — asserted equal to these batch forms in
tests/test_streaming.py (SURVEY §5 item 4).

Scale posture: window() and session_window() are grouping expressions —
partial aggregation applies, one shuffle on (window x key). Session
windows shuffle on user_id then sort-merge sessions per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Q54 — tumbling window aggregate
# --------------------------------------------------------------------------
@register(
    "z10654_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
    doc="6-hour tumbling windows per event type. Spark window() starts "
    "align to the epoch; DuckDB time_bucket's default origin "
    "(2000-01-03) is an exact multiple of 6h from the epoch, so bucket "
    "boundaries coincide (SURVEY §2.9 Q54).",
)
def z10654_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Q55 — sliding window aggregate
# --------------------------------------------------------------------------
@register(
    "z10655_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
             - k * INTERVAL '1 hour' AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest(range(0, 6)) AS k)
    GROUP BY window_start
    """,
    doc="6-hour windows sliding every hour: each event lands in 6 "
    "overlapping windows (Spark's window() replicates rows exactly like "
    "the oracle's unnest(range(0,6)) offset join) (SURVEY §2.9 Q55).",
)
def z10655_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# --------------------------------------------------------------------------
# Q56 — session window (30-minute gap)
# --------------------------------------------------------------------------
@register(
    "z10656_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc="Per-user session windows with a 30-minute gap. Spark "
    "session_window(end = last event + gap, half-open: an event at "
    "exactly last+gap starts a NEW session) == the oracle's "
    "lag >= 30min flag + running-sum session ids (SURVEY §2.9 Q56, "
    "§7 hard-item 2).",
)
def z10656_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# X20 — time-interval join (stream-stream join shape, batch form)
# --------------------------------------------------------------------------
@register(
    "z12789_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           p.ts AS purchase_ts, c.ts AS click_ts,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts
    """,
    doc="Attribution-style time-interval join: every (purchase, click) "
    "pair from the same user with the click in the 2 hours before the "
    "purchase. An equi-join on user_id with a range residual — one "
    "shuffle, no nested loop. The SAME shape runs as a true "
    "stream-stream inner join with two watermarks in streaming/ops.py "
    "(purchase_click_join), where the interval condition is what lets "
    "Spark evict both sides' state; replay == this batch form is "
    "asserted in tests/test_streaming.py. lag_us is an exact integer "
    "microsecond difference on both engines (SURVEY §2.9/X07-X11 "
    "extension).",
)
def z12789_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS"))
            & (F.col("click_ts") <= F.col("purchase_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            "purchase_ts",
            "click_ts",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
                "lag_us"
            ),
        )
    )


# --------------------------------------------------------------------------
# X23 — time-series gap-fill + forward fill (missing-bucket densification)
# --------------------------------------------------------------------------
@register(
    "z12792_gapfill",
    oracle="""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS observed
      FROM events GROUP BY event_type, h),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
    grid AS (
      SELECT et.event_type, gs.h
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                                (SELECT h1 FROM bounds),
                                                INTERVAL 1 HOUR)) AS h) gs),
    j AS (SELECT g.event_type, g.h, b.observed
          FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.h = b.h)
    SELECT event_type, h AS bucket, observed,
           last_value(observed IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM j
    """,
    doc="Time-series densification, an operator Spark has no primitive "
    "for: hourly buckets per event type, the missing buckets "
    "materialized from an exploded sequence over the observed bound "
    "(a ONE-ROW aggregate cross-joined with the 5-row type dim — the "
    "only whitelisted nested-loop shape, same class as x15), then "
    "forward-filled with last(ignorenulls) over an ordered window. "
    "Grid size is O(types x buckets), independent of event volume; the "
    "observed aggregation is the only data-sized shuffle. Decimal-exact "
    "sums as in q54 (time-series mandate extension).",
)
def z12792_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("observed")
    )
    bounds = b.agg(F.min("bucket").alias("h0"), F.max("bucket").alias("h1"))
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    grid = ev.select("event_type").distinct().crossJoin(hours)
    j = grid.join(b, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        "observed",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
    )
