"""Round-5 batch D (part 2): distributed linear algebra / iterative ML.
These close the loop the Gram matrix (q22) opened: actually SOLVING the
small systems that corpus-scale statistics reduce to, with every
distributed stage exact-integer and every IEEE step a fixed-form
expression evaluated in the same order by both engines.

- q40  multivariate OLS via normal equations + Cramer solve (n-huge/d-tiny)
- q41  full distributed Lloyd k-means (2 exact-integer iterations, k=8)
- q42  power iteration for the dominant eigenvector of X^T X

Cross-engine hash discipline: all sums are of exact quantized integers
(longs where bounded, DECIMAL(38,0)/HUGEINT where products overflow
int64); doubles appear only in FIXED expression trees (Cramer
determinants, per-iteration normalization) that Spark and DuckDB
evaluate in the identical left-to-right order — bit-identical outputs,
no rounding tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..functions.checkpointing import materialize
from .registry import register

# --------------------------------------------------------------------------
# Q40 — multivariate OLS via normal equations (Cramer's rule, d=3)
# --------------------------------------------------------------------------
# Moment magnitudes (sf0.1: n = 6e5): y <= 1.05e5 units, x1 <= 50,
# x2 <= 10 => Syy <= 6.6e15 < 2^53, every other moment smaller — all
# sums stay exact in int64 AND exactly representable as doubles.


@register(
    "q9340_ols_normal_eq",
    oracle="""
    WITH q AS (
      SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x1 * x1) AS BIGINT) AS s11,
             CAST(SUM(x1 * x2) AS BIGINT) AS s12,
             CAST(SUM(x2 * x2) AS BIGINT) AS s22,
             CAST(SUM(x1 * y) AS BIGINT) AS s1y,
             CAST(SUM(x2 * y) AS BIGINT) AS s2y,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM q),
    d AS (
      SELECT n, sy, s1y, s2y, syy,
             CAST(n AS DOUBLE) AS a, CAST(s1 AS DOUBLE) AS b,
             CAST(s2 AS DOUBLE) AS c, CAST(s1 AS DOUBLE) AS dd,
             CAST(s11 AS DOUBLE) AS e, CAST(s12 AS DOUBLE) AS f,
             CAST(s2 AS DOUBLE) AS g, CAST(s12 AS DOUBLE) AS h,
             CAST(s22 AS DOUBLE) AS i,
             CAST(sy AS DOUBLE) AS c1, CAST(s1y AS DOUBLE) AS c2,
             CAST(s2y AS DOUBLE) AS c3
      FROM m),
    sol AS (
      SELECT n, sy, s1y, s2y, syy,
        (a * (e * i - f * h) - b * (dd * i - f * g)
           + c * (dd * h - e * g)) AS det,
        (c1 * (e * i - f * h) - b * (c2 * i - f * c3)
           + c * (c2 * h - e * c3)) AS det0,
        (a * (c2 * i - f * c3) - c1 * (dd * i - f * g)
           + c * (dd * c3 - c2 * g)) AS det1,
        (a * (e * c3 - c2 * h) - b * (dd * c3 - c2 * g)
           + c1 * (dd * h - e * g)) AS det2
      FROM d)
    SELECT n,
           det0 / det AS b0, det1 / det AS b1, det2 / det AS b2,
           1.0 - (CAST(syy AS DOUBLE)
                  - (det0 / det * CAST(sy AS DOUBLE)
                     + det1 / det * CAST(s1y AS DOUBLE)
                     + det2 / det * CAST(s2y AS DOUBLE)))
               / (CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS r2
    FROM sol
    """,
    doc="Multivariate OLS (price ~ quantity + discount) via normal "
    "equations: the n-huge/d-tiny regression pattern where ONE "
    "map-side-combined aggregation reduces the whole fact table to "
    "ten exact integer moments (inputs floor-quantized so every sum "
    "is order-free and, being < 2^53, exactly representable as a "
    "double), and the 3x3 system solves by Cramer's rule in a FIXED "
    "expression tree — both engines evaluate the identical "
    "determinant formula left-to-right in IEEE doubles, so the "
    "coefficients and R^2 are bit-identical with no tolerance. "
    "At 100 TB nothing changes: shuffle volume is 10 numbers per "
    "partition, the solve is O(d^3) on one row. The same moments "
    "feed ridge (add lambda to the diagonal) for free; for d beyond "
    "a few hundred the Gram route (q22) + a driver-side Cholesky is "
    "the documented escalation path.",
)
def q9340_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long").alias("y"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x2"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = m.select(
        "n",
        "sy",
        "s1y",
        "s2y",
        "syy",
        F.col("n").cast("double").alias("a"),
        F.col("s1").cast("double").alias("b"),
        F.col("s2").cast("double").alias("c"),
        F.col("s1").cast("double").alias("dd"),
        F.col("s11").cast("double").alias("e"),
        F.col("s12").cast("double").alias("f"),
        F.col("s2").cast("double").alias("g"),
        F.col("s12").cast("double").alias("h"),
        F.col("s22").cast("double").alias("i"),
        F.col("sy").cast("double").alias("c1"),
        F.col("s1y").cast("double").alias("c2"),
        F.col("s2y").cast("double").alias("c3"),
    )

    # The SAME parse trees as the oracle SQL — column-for-column.
    def det3(a, b, c, d_, e, f, g, h, i):
        return (
            a * (e * i - f * h) - b * (d_ * i - f * g) + c * (d_ * h - e * g)
        )

    A = [F.col(x) for x in ("a", "b", "c", "dd", "e", "f", "g", "h", "i")]
    C = [F.col(x) for x in ("c1", "c2", "c3")]
    det = det3(*A)
    det0 = det3(C[0], A[1], A[2], C[1], A[4], A[5], C[2], A[7], A[8])
    det1 = det3(A[0], C[0], A[2], A[3], C[1], A[5], A[6], C[2], A[8])
    det2 = det3(A[0], A[1], C[0], A[3], A[4], C[1], A[6], A[7], C[2])
    # det0/det1/det2 above permute COLUMNS of A; the oracle writes the
    # same cofactor expansions explicitly — identical trees.
    sol = d.select(
        "n",
        "sy",
        "s1y",
        "s2y",
        "syy",
        det.alias("det"),
        det0.alias("det0"),
        det1.alias("det1"),
        det2.alias("det2"),
    )
    syy_d = F.col("syy").cast("double")
    sy_d = F.col("sy").cast("double")
    sse = syy_d - (
        (F.col("det0") / F.col("det")) * sy_d
        + (F.col("det1") / F.col("det")) * F.col("s1y").cast("double")
        + (F.col("det2") / F.col("det")) * F.col("s2y").cast("double")
    )
    sst = syy_d - sy_d * sy_d / F.col("n").cast("double")
    return sol.select(
        "n",
        (F.col("det0") / F.col("det")).alias("b0"),
        (F.col("det1") / F.col("det")).alias("b1"),
        (F.col("det2") / F.col("det")).alias("b2"),
        (F.lit(1.0) - sse / sst).alias("r2"),
    )


# --------------------------------------------------------------------------
# Q41 — full distributed Lloyd k-means (k=8, 2 exact-integer iterations)
# --------------------------------------------------------------------------
_KM_K = 8
_KM_D = 64  # fixture embedding dim (FIXTURES.md)
_KM_SCALE = 1_000_000.0


@register(
    "q9341_kmeans_lloyd",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                         AS BIGINT)) AS xq
      FROM embeddings),
    u AS (SELECT vec_id, d.i AS dim, xq[d.i] AS v
          FROM e, UNNEST(range(1, {_KM_D} + 1)) AS d(i)),
    seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_KM_K}),
    c0 AS (SELECT vec_id AS cid, dim, v AS s FROM u
           WHERE vec_id IN (SELECT vec_id FROM seeds)),
    a1 AS (SELECT u.vec_id, c0.cid,
             SUM(CAST(u.v - c0.s AS HUGEINT)
                 * CAST(u.v - c0.s AS HUGEINT)) AS dist
           FROM u JOIN c0 ON u.dim = c0.dim GROUP BY 1, 2),
    asg1 AS (SELECT vec_id, cid FROM
               (SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rk
                FROM a1) WHERE rk = 1),
    n1 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM asg1 GROUP BY cid),
    c1 AS (SELECT asg1.cid, u.dim, CAST(SUM(u.v) AS BIGINT) AS s
           FROM u JOIN asg1 ON u.vec_id = asg1.vec_id GROUP BY 1, 2),
    a2 AS (SELECT u.vec_id, c1.cid,
             SUM(CAST(u.v * n1.cnt - c1.s AS HUGEINT)
                 * CAST(u.v * n1.cnt - c1.s AS HUGEINT)) AS dist
           FROM u JOIN c1 ON u.dim = c1.dim
                  JOIN n1 ON n1.cid = c1.cid
           GROUP BY 1, 2),
    asg2 AS (SELECT vec_id, cid FROM
               (SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rk
                FROM a2) WHERE rk = 1)
    SELECT asg2.cid, CAST(COUNT(DISTINCT asg2.vec_id) AS BIGINT)
             AS n_members,
           CAST(SUM(u.v) AS BIGINT) AS mass,
           CAST(SUM(CASE WHEN u.dim = 1 THEN u.v ELSE 0 END) AS BIGINT)
             AS s0
    FROM asg2 JOIN u ON u.vec_id = asg2.vec_id
    GROUP BY asg2.cid
    """,
    doc="Full distributed Lloyd k-means over the embedding corpus: k=8 "
    "seeded from the 8 smallest vec_ids, TWO complete "
    "assign-then-recompute iterations, every arithmetic step exact. "
    "The divide-free trick that makes cross-engine hashing possible: "
    "instead of comparing ||x - s/cnt||^2 in floats, both engines "
    "minimize the cnt^2-scaled integer distance ||x*cnt - s||^2 "
    "(same argmin, pure integers — per-term bound ~5.4e18 squared in "
    "DECIMAL(12,0)^2 -> DECIMAL(25,0), summed into DECIMAL(38,0) / "
    "HUGEINT), with (dist, cid) lexicographic tie-break. Assignment "
    "is a broadcast of the k-row centroid table against the point "
    "stream (k*d longs — broadcastable for any practical k*d); "
    "centroid recompute is one partial-agg shuffle keyed cid with 64 "
    "per-dim long sums; the quantized base table is localCheckpointed "
    "once and reused by all stages (q88 lineage discipline). At "
    "100 TB each iteration is ONE scan + ONE k-keyed shuffle — the "
    "textbook scalable k-means; sampled init (z186's Lloyd-on-sample) "
    "remains the cheap-start companion. Unlike z186's sample-trained "
    "quantizer, every point participates in training here.",
)
def q9341_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.floor(
                    x.cast("double") * F.lit(_KM_SCALE) + F.lit(0.5)
                ).cast("long"),
            ).alias("xq"),
        )
        .transform(lambda df: materialize(df, eager=False))
    )

    def assign(cents):
        """Argmin over the k broadcast centroids of ||x*cnt - s||^2."""
        j = emb.crossJoin(F.broadcast(cents))
        diff = F.zip_with(
            "xq",
            "s",
            lambda x, sv: (x * F.col("cnt") - sv).cast("decimal(12,0)"),
        )
        dist = F.aggregate(
            diff,
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, d: acc + d * d,
        )
        return (
            j.select("vec_id", "cid", dist.alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"))
        )

    def recompute(asg):
        return (
            emb.join(asg, "vec_id")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.array(
                    *[F.sum(F.col("xq")[i]) for i in range(_KM_D)]
                ).alias("s"),
            )
        )

    cents0 = (
        emb.orderBy("vec_id")
        .limit(_KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("xq").alias("s"),
            F.lit(1).cast("long").alias("cnt"),
        )
    )
    asg1 = assign(cents0)
    cents1 = materialize(recompute(asg1), eager=False)
    asg2 = assign(cents1)
    return (
        emb.join(asg2, "vec_id")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(
                F.aggregate(
                    "xq", F.lit(0).cast("long"), lambda a, x: a + x
                )
            ).alias("mass"),
            F.sum(F.element_at("xq", 1)).alias("s0"),
        )
    )


# --------------------------------------------------------------------------
# Q42 — power iteration: dominant eigenvector of X^T X
# --------------------------------------------------------------------------
_PI_ITERS = 4
_PI_SCALE = 1_000_000.0


@register(
    "q9342_power_iteration",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0)
                         AS BIGINT))) AS v
      FROM embeddings),
    g0 AS (
      SELECT CAST(a.dim - 1 AS INT) AS i, CAST(b.dim - 1 AS INT) AS j,
             CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) / 1e12 AS gram
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      GROUP BY 1, 2),
    g AS (SELECT i, j, gram FROM g0
          UNION ALL
          SELECT j, i, gram FROM g0 WHERE i <> j),
    v0 AS (SELECT CAST(d.i AS INT) AS j,
                  CAST({int(_PI_SCALE)} AS BIGINT) AS v_u
           FROM UNNEST(range(0, 64)) AS d(i)),
    it1 AS (SELECT g.i,
              list_reduce(list(g.gram * CAST(v0.v_u AS DOUBLE) ORDER BY g.j),
                          (a, b) -> a + b) AS w
            FROM g JOIN v0 ON g.j = v0.j GROUP BY g.i),
    m1 AS (SELECT MAX(abs(w)) AS m FROM it1),
    v1 AS (SELECT CAST(it1.i AS INT) AS j,
                  CAST(floor(w / m * 1000000.0 + 0.5) AS BIGINT) AS v_u
           FROM it1, m1),
    it2 AS (SELECT g.i,
              list_reduce(list(g.gram * CAST(v1.v_u AS DOUBLE) ORDER BY g.j),
                          (a, b) -> a + b) AS w
            FROM g JOIN v1 ON g.j = v1.j GROUP BY g.i),
    m2 AS (SELECT MAX(abs(w)) AS m FROM it2),
    v2 AS (SELECT CAST(it2.i AS INT) AS j,
                  CAST(floor(w / m * 1000000.0 + 0.5) AS BIGINT) AS v_u
           FROM it2, m2),
    it3 AS (SELECT g.i,
              list_reduce(list(g.gram * CAST(v2.v_u AS DOUBLE) ORDER BY g.j),
                          (a, b) -> a + b) AS w
            FROM g JOIN v2 ON g.j = v2.j GROUP BY g.i),
    m3 AS (SELECT MAX(abs(w)) AS m FROM it3),
    v3 AS (SELECT CAST(it3.i AS INT) AS j,
                  CAST(floor(w / m * 1000000.0 + 0.5) AS BIGINT) AS v_u
           FROM it3, m3),
    it4 AS (SELECT g.i,
              list_reduce(list(g.gram * CAST(v3.v_u AS DOUBLE) ORDER BY g.j),
                          (a, b) -> a + b) AS w
            FROM g JOIN v3 ON g.j = v3.j GROUP BY g.i),
    m4 AS (SELECT MAX(abs(w)) AS m FROM it4),
    v4 AS (SELECT CAST(it4.i AS INT) AS j,
                  CAST(floor(w / m * 1000000.0 + 0.5) AS BIGINT) AS v_u
           FROM it4, m4)
    SELECT v4.j AS dim, v4.v_u, m4.m / 1000000.0 AS lam
    FROM v4, m4
    """,
    doc="Dominant eigenvector of the corpus Gram matrix X^T X (the top "
    "principal direction, unnormalized PCA) by relational power "
    "iteration: the d x d Gram matrix comes from q22's distributed "
    "integer-matmul kernel (the ONLY stage that touches the corpus; "
    "localCheckpointed once, reused by all rounds), then four "
    "matvec+normalize rounds run as d^2-row joins — matvec sums are "
    "ORDERED folds over j (F.aggregate / list_reduce, q24's "
    "portability pattern) so the IEEE accumulation sequence is "
    "identical on both engines; normalization divides by the exact "
    "max-abs (order-free) and floor-requantizes to 6dp integers, "
    "making each round's vector — and hence the final one — "
    "bit-identical with no tolerance. The max-abs scaling factor of "
    "the last round is the eigenvalue estimate (lam). At 100 TB the "
    "iteration cost is O(d^2) per round INDEPENDENT of corpus size — "
    "the Gram reduction is the only data-scale pass, which is what "
    "makes power iteration the scalable top-component method.",
)
def q9342_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .q_r5_llm import z138322_gram_matrix

    g0 = z138322_gram_matrix(spark, sf_dir)
    g = (
        g0.unionAll(
            g0.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "gram"
            )
        )
        .transform(lambda df: materialize(df, eager=False))
    )
    v = spark.range(64).select(
        F.col("id").cast("int").alias("j"),
        F.lit(int(_PI_SCALE)).cast("long").alias("v_u"),
    )
    m_last = None
    for _ in range(_PI_ITERS):
        terms = g.join(v, "j").select(
            "i",
            "j",
            (F.col("gram") * F.col("v_u").cast("double")).alias("term"),
        )
        # Each round's w is referenced twice (max-abs scalar + the
        # requantized vector) and feeds the next round: checkpoint it so
        # the plan stays linear in rounds instead of doubling per round.
        w = (
            terms.groupBy("i")
            .agg(
                F.sort_array(F.collect_list(F.struct("j", "term"))).alias(
                    "ts"
                )
            )
            .select(
                "i",
                F.aggregate(
                    F.transform("ts", lambda s: s["term"]),
                    F.lit(0.0),
                    lambda a, t: a + t,
                ).alias("w"),
            )
            .transform(lambda df: materialize(df, eager=False))
        )
        m_last = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = w.crossJoin(F.broadcast(m_last)).select(
            F.col("i").alias("j"),
            F.floor(F.col("w") / F.col("m") * F.lit(_PI_SCALE) + F.lit(0.5))
            .cast("long")
            .alias("v_u"),
        )
    return v.crossJoin(F.broadcast(m_last)).select(
        F.col("j").alias("dim"),
        "v_u",
        (F.col("m") / F.lit(_PI_SCALE)).alias("lam"),
    )
