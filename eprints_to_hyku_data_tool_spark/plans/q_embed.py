"""Embedding-column operators (round-3 breadth batch 3): int8 scalar
quantization and random-hyperplane (sign) LSH near-dup — the two
embedding-side tools a training pipeline needs besides the IVF/top-k
family in q_north.

Cross-engine discipline: every quantity that is summed is INTEGER by
construction (floats are quantized to micro-units with an explicit
``floor(x*1e6 + 0.5)`` before any aggregate), so sums are exact and
summation-order independent on both engines — no decimal casts, no
rounding of transcendentals, no tie-breaking ambiguity (``floor(x+0.5)``
is the same IEEE operation everywhere, unlike ROUND's per-engine
half-up/half-even variance on exact .5 ties). The only float outputs are
6dp-rounded cosines, under the q18 rule (fixture margin >= 1e-4 to the
tau threshold, verified offline)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# --------------------------------------------------------------------------
# Q73 (was Y42) — int8 scalar quantization (per-vector absmax scale)
# --------------------------------------------------------------------------


@register(
    "z173_int8_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id, v,
                 greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
                   AS amax
          FROM e),
    qq AS (SELECT vec_id, amax,
                  list_transform(
                    v, x -> CAST(floor(x * 127 / amax + 0.5) AS INT)) AS qv,
                  list_transform(
                    v, x -> CAST(floor(
                      abs(x - floor(x * 127 / amax + 0.5) * amax / 127) * 1e6
                      + 0.5) AS BIGINT)) AS ev
           FROM q)
    SELECT vec_id,
           round(amax, 6) AS amax,
           array_to_string(qv, ',') AS q_vec,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(list_aggregate(ev, 'sum') AS BIGINT) AS recon_err_e6
    FROM qq
    """,
    doc="Int8 scalar quantization of the embedding column (absmax per "
    "vector, the llama.cpp/FAISS SQ8 scheme): q_i = floor(x_i * 127 / "
    "absmax + 0.5), 4x smaller vectors for ANN candidate generation "
    "with the original floats kept only for final re-ranking. Pure "
    "row-level array math — zero shuffles, embarrassingly parallel at "
    "any scale. The reconstruction-error checksum is summed in integer "
    "micro-units (floor(err*1e6+0.5)) so the audit column is exact and "
    "order-independent; floor(x+0.5) rounding (not ROUND) removes the "
    "half-up/half-even cross-engine tie hazard (quantization mandate).",
)
def z173_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    d = emb.select("vec_id", v.alias("v")).withColumn(
        "amax",
        F.greatest(
            F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
        ),
    )
    qi = lambda x: F.floor(x * 127 / F.col("amax") + 0.5)  # noqa: E731
    qq = d.select(
        "vec_id",
        "amax",
        F.transform("v", lambda x: qi(x).cast("int")).alias("qv"),
        F.transform(
            "v",
            lambda x: F.floor(
                F.abs(x - qi(x) * F.col("amax") / 127) * 1e6 + 0.5
            ).cast("long"),
        ).alias("ev"),
    )
    zero = F.lit(0).cast("long")
    return qq.select(
        "vec_id",
        F.round("amax", 6).alias("amax"),
        # Serialized (not raw array<int>): the driver's canonicalizer
        # lexsorts output columns via pandas, which cannot hash ndarray
        # cells — r3's one red row. Registered outputs must stay scalar.
        F.concat_ws(
            ",", F.transform("qv", lambda x: x.cast("string"))
        ).alias("q_vec"),
        F.aggregate("qv", zero, lambda a, x: a + x).alias("q_sum"),
        F.array_min("qv").cast("int").alias("q_min"),
        F.array_max("qv").cast("int").alias("q_max"),
        F.aggregate("ev", zero, lambda a, x: a + x).alias("recon_err_e6"),
    )


# --------------------------------------------------------------------------
# Q74 (was Y43) — random-hyperplane LSH near-dup (banded sign signatures)
# --------------------------------------------------------------------------
# 16 bands x 8 bits (128 planes). Band width sets the RANDOM-pair
# collision rate — the quantity that decides whether the candidate set
# is sub-quadratic: b bands of s bits admit ~b/2^s of all unrelated
# pairs (sign-LSH collision prob for near-orthogonal vectors is 1/2 per
# bit). The original 4x4 config admitted ~4/16 = 23% of ALL pairs —
# a quadratic verify with a small constant, caught by the round-7 10x
# scale smoke (z74 scaled 13.4x where data-linear is 10x). 16x8 admits
# ~16/256 = 6% while keeping tau=0.4 recall above the 0.2 contract —
# measured on the fixtures: 6.8% of all pairs as candidates (ideal
# Gaussian planes give 7.0%), recall 0.32 at sf0.01 / 0.37 at sf0.1.
_N_PLANES = 128
_N_BANDS = 16
_BAND_BITS = _N_PLANES // _N_BANDS
_RP_TAU = 0.4  # same tau + 1e-4 fixture margin as q18/q67


def _plane_weights(p: int) -> list[int]:
    """Deterministic integer 'hyperplane' p:
    w_d = ((p*73 + d*151 + p*d*53) % 131) - 65.

    A fixed pseudo-random projection both engines can regenerate exactly —
    integer weights in [-65, 65] play the role of N(0,1) Gaussians (sign
    LSH only needs directional diversity, not true Gaussianity). The
    cross term p*d is load-bearing: the earlier purely-affine family
    ((p*73 + d*151) % 97) made every plane a SHIFT of one sawtooth in d
    (and repeated outright with period 97 in p), so scaling past ~16
    planes added correlated/duplicate bits instead of independent ones —
    the 128-plane config actually RAISED the candidate rate. With a
    per-plane stride (151 + 53p, invertible mod the prime 131, distinct
    for 128 planes) the planes sample the sawtooth at 128 different
    frequencies; measured candidate rates match ideal Gaussian planes
    within 3% on the fixtures."""
    return [((p * 73 + d * 151 + p * d * 53) % 131) - 65 for d in range(64)]


def _band_sigs_udf():
    """Arrow-batched signature kernel: one int64 matmul against the fixed
    64x16 weight matrix per batch. Exact integer arithmetic (|vq| <= ~1e7,
    |w| <= 48, 64 terms -> < 2^35, no overflow), so the signatures are
    bit-identical to a per-element fold on any engine or partitioning —
    but ~50x faster than the 16-fold Column-expression form, whose giant
    literal tree fell off the codegen fast path (measured 9.3 s -> 0.4 s
    warm at sf0.1)."""
    W = np.array(
        [_plane_weights(p) for p in range(_N_PLANES)], dtype=np.int64
    ).T  # dims x planes
    pw = 1 << np.arange(_BAND_BITS, dtype=np.int64)

    @F.pandas_udf("array<int>")
    def band_sigs(vq: pd.Series) -> pd.Series:
        m = np.stack(vq.values).astype(np.int64)  # batch x dims
        bits = (m @ W) >= 0  # batch x planes
        sigs = np.stack(
            [
                (bits[:, b * _BAND_BITS : (b + 1) * _BAND_BITS] * pw).sum(
                    axis=1
                )
                for b in range(_N_BANDS)
            ],
            axis=1,
        )
        return pd.Series([row.astype("int32").tolist() for row in sigs])

    return band_sigs


@register(
    "q74_rplsh_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id, v,
                 list_transform(
                   v, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS vq
          FROM e),
    bits AS (SELECT q.vec_id, p.range AS p,
               CASE WHEN CAST(list_sum(list_transform(range(1, 65),
                 d -> q.vq[d] * (((p.range * 73 + (d - 1) * 151
                                   + p.range * (d - 1) * 53) % 131) - 65)))
                 AS BIGINT) >= 0 THEN 1 ELSE 0 END AS bit
             FROM q CROSS JOIN range(0, {_N_PLANES}) p),
    bands AS (SELECT vec_id, CAST(p // {_BAND_BITS} AS INT) AS band,
                     CAST(SUM(bit * (1 << (p % {_BAND_BITS}))) AS INT) AS sig
              FROM bits GROUP BY p // {_BAND_BITS}, vec_id),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
    cs AS (SELECT c.id_a, c.id_b,
             list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v))
                * sqrt(list_dot_product(eb.v, eb.v))) AS cos
           FROM cand c JOIN e ea ON ea.vec_id = c.id_a
                       JOIN e eb ON eb.vec_id = c.id_b)
    SELECT id_a, id_b, round(cos, 6) AS cos_sim
    FROM cs WHERE cos >= {_RP_TAU}
    """,
    doc="Random-hyperplane (sign) LSH near-dup over embeddings — the "
    "sixth dedup family, and the sub-quadratic EMBEDDING sibling of "
    "z660_minhash_lsh: 128 fixed integer hyperplanes give 128 sign "
    "bits, banded 16x8; vectors sharing any band signature become "
    "candidates via a (band, sig) equi-join; only candidates get the "
    "exact cosine verify (tau=0.4, q18 margin rule). Every dot against "
    "a hyperplane is an exact BIGINT sum over micro-quantized "
    "components, so signatures are engine- and partitioning-"
    "independent — the whole candidate set is deterministic, which is "
    "what makes an LSH pipeline SQL-oracle-checkable at all. Scale "
    "shape: signatures are row-level (zero shuffle), the bucket join "
    "shuffles O(16n) signature rows plus a candidate set bounded by "
    "~16/2^8 = 6% of pairs for UNRELATED vectors (8-bit bands; the "
    "round-7 scale smoke caught the old 4-bit bands admitting 23%), "
    "while tau-similar pairs still collide at >= 0.33; collisions "
    "concentrate by construction, so AQE skew-split handles hot "
    "buckets (SURVEY §4).",
)
def q74_rplsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v")).withColumn(
        "vq",
        F.transform("v", lambda x: F.floor(x * 1e6 + 0.5).cast("long")),
    )
    sigs = base.select(
        "vec_id", F.posexplode(_band_sigs_udf()(F.col("vq"))).alias("band", "sig")
    )
    cand = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    e = base.select("vec_id", "v")
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda a, z: a + z,
    )
    pairs = (
        cand.join(e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn(
            "cos",
            dot(F.col("va"), F.col("vb"))
            / (
                F.sqrt(dot(F.col("va"), F.col("va")))
                * F.sqrt(dot(F.col("vb"), F.col("vb")))
            ),
        )
    )
    return pairs.filter(F.col("cos") >= _RP_TAU).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos_sim")
    )


# --------------------------------------------------------------------------
# Y63 — nearest-centroid classification audit (exact-decimal distances)
# --------------------------------------------------------------------------
@register(
    "q237_nearest_centroid",
    oracle="""
    WITH x AS (
      SELECT vec_id, label AS label_true,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE), 6) * 1000000
                         AS BIGINT))) AS xu
      FROM embeddings),
    c AS (SELECT label_true AS label_c, dim,
                 CAST(SUM(xu) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM x GROUP BY label_true, dim),
    d AS (SELECT x.vec_id, x.label_true, c.label_c,
                 CAST(SUM(CAST(c.n * x.xu - c.s AS DECIMAL(19,0))
                          * CAST(c.n * x.xu - c.s AS DECIMAL(19,0)))
                      AS DOUBLE) / (ANY_VALUE(c.n) * ANY_VALUE(c.n)) AS d2
          FROM x JOIN c ON x.dim = c.dim
          GROUP BY x.vec_id, x.label_true, c.label_c),
    p AS (SELECT vec_id, label_true, label_c,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, label_c) AS rk
          FROM d)
    SELECT CAST(label_true AS INT) AS label_true,
           CAST(label_c AS INT) AS label_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE rk = 1
    GROUP BY label_true, label_c
    """,
    doc="Nearest-centroid classification audit: every vector is assigned "
    "to its closest per-label centroid (y38's centroids) and the "
    "(true, predicted) confusion matrix comes back — the standard "
    "are-my-labels-separable / cluster-drift check on an embedding "
    "column. Distances are EXACT until the last step: embeddings "
    "quantize to integer micro-units (y38's 6dp rule), the centroid "
    "is kept as the exact pair (sum s, count n) instead of a lossy "
    "mean, and ||x - s/n||^2 is evaluated as SUM((n*xu - s)^2)/n^2 "
    "with the squares in DECIMAL(38,0) — summation-order-proof, so "
    "the double cast at the end is bit-identical in both engines and "
    "the argmin (ties broken by label) can never flip cross-engine "
    "even when margins are tiny (near-uniform fixture embeddings are "
    "exactly that worst case). Plan: one partial-agg shuffle for "
    "centroids (640 cells, broadcast back), one for the per-"
    "(vector, label) distance agg, one row_number window, one tiny "
    "confusion agg (embedding-eval mandate).",
)
def q237_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.col("label").alias("label_true"),
        F.posexplode("embedding").alias("pos", "fval"),
    ).select(
        "vec_id",
        "label_true",
        (F.col("pos") + 1).alias("dim"),
        (F.round(F.col("fval").cast("double"), 6) * 1_000_000)
        .cast("long")
        .alias("xu"),
    )
    c = x.groupBy(F.col("label_true").alias("label_c"), "dim").agg(
        F.sum("xu").alias("s"), F.count(F.lit(1)).alias("n")
    )
    diff = (F.col("n") * F.col("xu") - F.col("s")).cast("decimal(19,0)")
    d = (
        x.join(F.broadcast(c), "dim")
        .groupBy("vec_id", "label_true", "label_c")
        .agg(
            (
                F.sum(diff * diff).cast("double")
                / (F.first("n") * F.first("n"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "label_c")
    p = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return p.groupBy(
        F.col("label_true").cast("int").alias("label_true"),
        F.col("label_c").cast("int").alias("label_pred"),
    ).agg(F.count(F.lit(1)).alias("n"))
