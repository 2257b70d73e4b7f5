"""Round-5 overflow tier (y75-y77): the driver window is full at 50
names, so these register as y-tier — locally oracle-verified on every
test run like everything else, and first in line for the round-6
window rotation (registry.py naming scheme).

- y75  STL-lite seasonal decomposition (trend / day-of-week / residual)
- y76  per-node local clustering coefficient (z195's oriented kernel)
- y77  Holt linear smoothing (two-state ordered fold, recursive oracle)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Y75 — STL-lite seasonal decomposition of the daily event series
# --------------------------------------------------------------------------
@register(
    "y75_stl_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_u
      FROM events GROUP BY 1, 2),
    win AS (
      SELECT event_type, day, total_u,
             CAST(SUM(total_u) OVER w AS BIGINT) AS sum7,
             CAST(COUNT(*) OVER w AS BIGINT) AS cnt7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT event_type, day, total_u,
             7 * total_u - sum7 AS detrended_u,
             dayofweek(day) AS dow
      FROM win WHERE cnt7 = 7),
    seas AS (
      SELECT event_type, dow,
             CAST(SUM(detrended_u) AS DOUBLE)
               / CAST(COUNT(*) AS BIGINT) AS seasonal
      FROM det GROUP BY 1, 2)
    SELECT det.event_type, det.day, det.total_u, det.detrended_u,
           seas.seasonal,
           CAST(det.detrended_u AS DOUBLE) - seas.seasonal AS residual
    FROM det JOIN seas
      ON det.event_type = seas.event_type AND det.dow = seas.dow
    """,
    doc="STL-lite seasonal decomposition, one series per event_type: "
    "trend is a 7-day centered moving window (full windows only), "
    "detrending stays EXACT by comparing 7*x against the 7-day sum "
    "(integer, no division), the day-of-week seasonal component is "
    "the mean of the detrended values per (series, dow) — one IEEE "
    "division of exact integers — and the residual is one fixed-form "
    "subtraction. The classic monitoring decomposition (is Monday "
    "always low, or is THIS Monday anomalous?) feeding the z187/q47 "
    "outlier scorers with a seasonality-adjusted signal. Shuffles: "
    "the (series, day) rollup, one series-keyed window, one tiny "
    "(series x 7) seasonal aggregate joined back broadcast. At "
    "100 TB the series key has the cardinality of the metric "
    "catalogue — each series' window state is 7 rows.",
)
def y75_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"))
        .alias("total_u")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.select(
        "event_type",
        "day",
        "total_u",
        F.sum("total_u").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("cnt7"),
    )
    det = win.filter(F.col("cnt7") == 7).select(
        "event_type",
        "day",
        "total_u",
        (F.lit(7) * F.col("total_u") - F.col("sum7")).alias("detrended_u"),
        # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6.
        (F.dayofweek("day") - 1).alias("dow"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        (
            F.sum("detrended_u").cast("double")
            / F.count(F.lit(1)).cast("bigint")
        ).alias("seasonal")
    )
    return det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "total_u",
        "detrended_u",
        "seasonal",
        (F.col("detrended_u").cast("double") - F.col("seasonal")).alias(
            "residual"
        ),
    )


# --------------------------------------------------------------------------
# Y76 — per-node local clustering coefficient
# --------------------------------------------------------------------------
@register(
    "y76_clustering_coefficient",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
      GROUP BY node),
    tri AS (
      SELECT t.u AS a, t.b, t.c
      FROM (SELECT e1.u, e1.v AS b, e2.v AS c
            FROM pairs e1 JOIN pairs e2
              ON e1.u = e2.u AND e1.v < e2.v) t
      JOIN pairs e3 ON e3.u = t.b AND e3.v = t.c),
    pernode AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY node)
    SELECT deg.node, deg.deg,
           CAST(COALESCE(pernode.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * COALESCE(pernode.n_triangles, 0) AS DOUBLE)
             / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS coeff
    FROM deg LEFT JOIN pernode ON deg.node = pernode.node
    WHERE deg.deg >= 2
    """,
    doc="Per-node local clustering coefficient over the co-purchase "
    "graph: 2*T(v) / (deg(v)*(deg(v)-1)) — the community-structure "
    "profile that complements z195's global triangle count. Triangle "
    "enumeration reuses z195's degree-ordered orientation (each wedge "
    "fans out from its LOW-degree endpoint, O(m^1.5) under skew; the "
    "oracle enumerates with the simpler id-ordering — the triangle "
    "SET is orientation-invariant, so per-node credits agree), then "
    "every closed triangle credits its three corners via an explode + "
    "node-keyed count. The coefficient is one IEEE division of exact "
    "integers. Shuffles on top of z195's: one explode-count and one "
    "degree join — both node-keyed.",
)
def y76_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    withdeg = und.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    ).localCheckpoint(eager=True)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.s") == F.col("e2.s")).filter(
        (F.col("e1.dt") < F.col("e2.dt"))
        | (
            (F.col("e1.dt") == F.col("e2.dt"))
            & (F.col("e1.t") < F.col("e2.t"))
        )
    )
    # Close the wedge with the oriented edge between the two heads; the
    # oriented edge's endpoints are ordered by (deg, id), matching the
    # wedge filter above, so each triangle closes exactly once.
    closing = oriented.select(
        F.col("s").alias("ct_lo"), F.col("t").alias("ct_hi")
    )
    tri = wedges.join(
        closing,
        (F.col("e1.t") == F.col("ct_lo")) & (F.col("e2.t") == F.col("ct_hi")),
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    pernode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(pernode, "node", "left")
        .filter(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            (
                (F.lit(2) * F.coalesce("n_triangles", F.lit(0))).cast(
                    "double"
                )
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("coeff"),
        )
    )


# --------------------------------------------------------------------------
# Y77 — Holt linear smoothing (level + trend, two-state ordered fold)
# --------------------------------------------------------------------------
@register(
    "y77_holt_linear",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS value_u,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events),
    p AS (SELECT user_id, pos, CAST(value_u AS DOUBLE) AS x FROM ev),
    n AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM p
          GROUP BY user_id),
    rec AS (
      SELECT user_id, pos, x AS l, CAST(0.0 AS DOUBLE) AS t
      FROM p WHERE pos = 1
      UNION ALL
      SELECT p.user_id, p.pos,
             p.x * 0.5 + (rec.l + rec.t) * 0.5 AS l,
             (p.x * 0.5 + (rec.l + rec.t) * 0.5 - rec.l) * 0.25
               + rec.t * 0.75 AS t
      FROM rec JOIN p ON p.user_id = rec.user_id AND p.pos = rec.pos + 1)
    SELECT rec.user_id, n.n_events, rec.l AS level, rec.t AS trend
    FROM rec JOIN n ON rec.user_id = n.user_id
    WHERE rec.pos = n.n_events
    """,
    doc="Holt linear (double exponential) smoothing per user, alpha=0.5 "
    "beta=0.25: level' = a*x + (1-a)(level+trend), trend' = "
    "b*(level'-level) + (1-b)*trend, seeded (x1, 0). The two-state "
    "recurrence runs as an ORDERED fold with a STRUCT accumulator "
    "(F.aggregate over the (ts_us, event_id)-sorted list — the q36 "
    "pattern generalized to vector state), while the oracle unrolls "
    "the same recurrence as a RECURSIVE CTE stepping position by "
    "position. Both engines evaluate the identical expression trees "
    "(all coefficients exact binary fractions; level' re-expanded "
    "verbatim inside trend' on both sides), so level and trend are "
    "bit-identical with no tolerance. One user_id shuffle; the "
    "streaming form keeps (level, trend) as O(1) state exactly like "
    "streaming_ewma.",
)
def y77_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("value_u"),
    )
    series = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts_us", "event_id", "value_u"))
            ),
            lambda s: s["value_u"].cast("double"),
        ).alias("xs")
    )
    init = F.struct(
        F.element_at("xs", 1).alias("l"), F.lit(0.0).alias("t")
    )

    def step(acc, x):
        lnew = x * F.lit(0.5) + (acc["l"] + acc["t"]) * F.lit(0.5)
        # trend re-expands level' verbatim — the oracle does the same,
        # so the expression trees (and the result bits) match.
        tnew = (
            x * F.lit(0.5) + (acc["l"] + acc["t"]) * F.lit(0.5) - acc["l"]
        ) * F.lit(0.25) + acc["t"] * F.lit(0.75)
        return F.struct(lnew.alias("l"), tnew.alias("t"))

    folded = F.aggregate(
        F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        init,
        step,
    )
    return series.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        folded["l"].alias("level"),
        folded["t"].alias("trend"),
    )
