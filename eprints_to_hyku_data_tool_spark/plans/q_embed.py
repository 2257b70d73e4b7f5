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

from ..functions.skew import salted_pair_groups
from ..sources.tables import load_table
from .registry import register

# --------------------------------------------------------------------------
# Q73 (was Y42) — int8 scalar quantization (per-vector absmax scale)
# --------------------------------------------------------------------------


@register(
    "z139173_int8_quantize",
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
def z139173_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# SIZE-DRIVEN banding (VERDICT r9 item 5). Band geometry sets the
# RANDOM-pair collision rate — the quantity that decides whether the
# candidate set is sub-quadratic: b bands of s bits admit ~b/2^s of all
# unrelated pairs (sign-LSH collision prob for near-orthogonal vectors
# is 1/2 per bit). The round-9 measurement (RPLSH_EXPONENT.json) proved
# any FIXED config is quadratic-with-a-constant: 16x8 admits a
# scale-constant 6.85% of all pairs (the 16/2^8 floor). The textbook
# n^(1+rho) curve requires the config to GROW with corpus size: band
# bits s ~ log2(n) (keeps the per-band random floor at ~1/n) and band
# count b ~ n^rho with rho = ln(1/p1)/ln(1/p2) = log2(1/0.631) = 0.664
# at tau = 0.4 (keeps boundary recall constant). derive_banding() below
# is that schedule on an exact-integer lattice shared verbatim by the
# DuckDB oracle: per doubling of n past the anchor, s += 1 and
# b *= ~2^(2/3) via the ladder [16, 26, 41] << (2*(e//3)) (26 ~ 16*1.587,
# 41 ~ 16*2.52; every third step is exactly x4, matching (1/p1)^3 = 3.98
# to 0.5%). Anchor 2048 = the next power of two above the largest
# fixture corpus (sf0.1: 2000 vectors), so every fixture tier keeps the
# measured 16x8 point (recall 0.32/0.37, candidates 6.8% vs ideal
# Gaussian 7.0%) and every recorded artifact stays valid; the 10x tier
# (n = 20000) derives 104x12, floor 104/4096 = 2.5% — measured in
# RPLSH_EXPONENT.json's derived-config section.
_RP_ANCHOR = 2048
_RP_TAU = 0.4  # same tau + 1e-4 fixture margin as q18/q67
# Shared plane-count ceiling: the SQL oracle enumerates range(0, 8192)
# planes and error()s past it; derive_banding raises at the same
# boundary so a Spark-only run cannot silently cross into duplicate
# planes (_plane_weights period = 131^2 = 17161). 8192 covers e <= 7,
# i.e. corpora to ~262k vectors; past that, extend the family (more
# decorrelated blocks) BEFORE raising the cap.
_RP_PLANE_CAP = 8192
# The anchor point's geometry (what fixtures run, and the fallback
# callers that predate size-driving still get):
_N_BANDS = 16
_BAND_BITS = 8
_N_PLANES = _N_BANDS * _BAND_BITS


def derive_banding(n: int) -> tuple[int, int]:
    """(n_bands, band_bits) for a corpus of n vectors — the n^(1+rho)
    schedule anchored at 16x8 for n <= 2048. Exact integer arithmetic;
    the z874 oracle derives the identical values in SQL (a params CTE
    over COUNT(*) — same anchor, same ladder), so both engines band
    identically at every corpus size by construction."""
    e = 0
    while (_RP_ANCHOR << e) < n:
        e += 1
    bands, bits = (16, 26, 41)[e % 3] << (2 * (e // 3)), 8 + e
    # Python-side mirror of the oracle's error() branch (code review
    # r10): the SQL oracle enumerates range(0, 8192) planes and raises
    # past that, but a Spark-only run would otherwise sail past the cap
    # into _plane_weights' period (131^2 = 17161 — plane p and p+17161
    # are identical), silently degrading recall with duplicate bits.
    # No silent caps: fail loudly in BOTH engines at the same boundary.
    if bands * bits > _RP_PLANE_CAP:
        raise ValueError(
            f"derived banding {bands}x{bits} needs {bands * bits} planes"
            f" > the shared {_RP_PLANE_CAP}-plane cap (corpus n={n}, e={e});"
            " extend the plane family before raising the cap —"
            " _plane_weights repeats with period 131^2 = 17161"
        )
    return bands, bits


def _plane_weights(p: int) -> list[int]:
    """Deterministic integer 'hyperplane' p:
    w_d = ((p*73 + d*151 + p*d*53 + (p//131)*(d*d*29 + d*97)) % 131) - 65.

    A fixed pseudo-random projection both engines can regenerate exactly —
    integer weights in [-65, 65] play the role of N(0,1) Gaussians (sign
    LSH only needs directional diversity, not true Gaussianity). The
    cross term p*d is load-bearing: the earlier purely-affine family
    ((p*73 + d*151) % 97) made every plane a SHIFT of one sawtooth in d
    (and repeated outright with period 97 in p), so scaling past ~16
    planes added correlated/duplicate bits instead of independent ones —
    the 128-plane config actually RAISED the candidate rate. With a
    per-plane stride (151 + 53p, invertible mod the prime 131, distinct
    for 131 planes) the planes sample the sawtooth at 131 different
    frequencies; measured candidate rates match ideal Gaussian planes
    within 3% on the fixtures.

    Size-driven banding needs MORE than 131 planes (the 10x tier derives
    104x12 = 1248), and the linear family repeats with period 131 in p —
    plane 131 would be a shifted copy of plane 0. Each block
    q = p // 131 therefore adds a block-specific QUADRATIC phase
    q*(29d^2 + 97d): within a block the strides stay distinct as before,
    and across blocks the quadratic coefficient 29q mod 131 differs, so
    no plane is an affine shift of another for p < 131^2 (Weyl
    quadratic-phase decorrelation). p < 131 is bit-identical to the
    round-8 family — fixture signatures, and every recorded artifact,
    are unchanged. Verified by measurement, not just argument: the
    derived-config candidate rate at the 10x tier sits under the
    fixed-config floor in RPLSH_EXPONENT.json."""
    q = p // 131
    return [
        ((p * 73 + d * 151 + p * d * 53 + q * (d * d * 29 + d * 97)) % 131)
        - 65
        for d in range(64)
    ]


def _band_sigs_udf(n_bands: int = _N_BANDS, band_bits: int = _BAND_BITS):
    """Arrow-batched signature kernel: one int64 matmul against the fixed
    64 x (n_bands*band_bits) weight matrix per batch. Exact integer
    arithmetic (|vq| <= ~1e7, |w| <= 65, 64 terms -> < 2^36, no
    overflow), so the signatures are bit-identical to a per-element fold
    on any engine or partitioning — but ~50x faster than the 16-fold
    Column-expression form, whose giant literal tree fell off the
    codegen fast path (measured 9.3 s -> 0.4 s warm at sf0.1)."""
    n_planes = n_bands * band_bits
    W = np.array(
        [_plane_weights(p) for p in range(n_planes)], dtype=np.int64
    ).T  # dims x planes
    pw = 1 << np.arange(band_bits, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def band_sigs(vq: pd.Series) -> pd.Series:
        m = np.stack(vq.values).astype(np.int64)  # batch x dims
        bits = (m @ W) >= 0  # batch x planes
        sigs = np.stack(
            [
                (bits[:, b * band_bits : (b + 1) * band_bits] * pw).sum(
                    axis=1
                )
                for b in range(n_bands)
            ],
            axis=1,
        )
        return pd.Series([row.tolist() for row in sigs])

    return band_sigs


@register(
    "z13974_rplsh_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    -- size-driven banding: the SAME integer schedule as
    -- derive_banding() (anchor {_RP_ANCHOR}, bits 8+e, band ladder
    -- [16,26,41] << 2*(e//3)) derived here from COUNT(*), so both
    -- engines band identically at every corpus size by construction
    params AS (
      SELECT CAST(8 + e AS BIGINT) AS bits,
             -- the plane enumeration below is capped at
             -- {_RP_PLANE_CAP}; a corpus deriving more planes must FAIL
             -- loudly, never silently truncate its banding
             -- (no-silent-caps rule; derive_banding raises at the SAME
             -- boundary Python-side)
             CASE WHEN (8 + e)
                       * ((CASE e % 3 WHEN 0 THEN 16 WHEN 1 THEN 26
                           ELSE 41 END)
                          * (CAST(1 AS BIGINT) << (2 * (e // 3))))
                      > {_RP_PLANE_CAP}
                  THEN error('derived plane count exceeds the oracle '
                             'range(0, {_RP_PLANE_CAP}) cap — raise '
                             'the cap')
                  ELSE CAST((CASE e % 3 WHEN 0 THEN 16 WHEN 1 THEN 26
                             ELSE 41 END)
                            * (CAST(1 AS BIGINT) << (2 * (e // 3)))
                            AS BIGINT)
             END AS bands
      FROM (SELECT MIN(r.range) AS e
            FROM range(0, 40) r
            WHERE {_RP_ANCHOR} * (CAST(1 AS BIGINT) << r.range)
                  >= (SELECT COUNT(*) FROM embeddings))),
    q AS (SELECT vec_id, v,
                 list_transform(
                   v, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS vq
          FROM e),
    bits AS (SELECT q.vec_id, p.range AS p, params.bits AS s,
               CASE WHEN CAST(list_sum(list_transform(range(1, 65),
                 d -> q.vq[d] * (((p.range * 73 + (d - 1) * 151
                                   + p.range * (d - 1) * 53
                                   + (p.range // 131)
                                     * ((d - 1) * (d - 1) * 29
                                        + (d - 1) * 97)) % 131) - 65)))
                 AS BIGINT) >= 0 THEN 1 ELSE 0 END AS bit
             FROM q CROSS JOIN params CROSS JOIN range(0, {_RP_PLANE_CAP}) p
             WHERE p.range < params.bands * params.bits),
    bands AS (SELECT vec_id, CAST(p // s AS INT) AS band,
                     CAST(SUM(bit * (CAST(1 AS BIGINT) << (p % s)))
                          AS BIGINT) AS sig
              FROM bits GROUP BY p // s, vec_id),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
    -- cosine over the MICRO-QUANTIZED vectors: every dot is an exact
    -- integer (|dot| <= 64 * (0.58e6)^2 ~ 2.1e13 < 2^53, so even a
    -- double accumulator is exact and summation order cannot matter)
    cs AS (SELECT c.id_a, c.id_b,
             list_dot_product(qa.vq, qb.vq)
             / (sqrt(list_dot_product(qa.vq, qa.vq))
                * sqrt(list_dot_product(qb.vq, qb.vq))) AS cos
           FROM cand c JOIN q qa ON qa.vec_id = c.id_a
                       JOIN q qb ON qb.vec_id = c.id_b)
    SELECT id_a, id_b, round(cos, 6) AS cos_sim
    FROM cs WHERE cos >= {_RP_TAU}
    """,
    doc="Random-hyperplane (sign) LSH near-dup over embeddings — the "
    "sixth dedup family, and the sub-quadratic EMBEDDING sibling of "
    "z11660_minhash_lsh: 128 fixed integer hyperplanes give 128 sign "
    "bits, banded 16x8; vectors sharing a band signature are verified "
    "bucket-locally with an exact integer Gram matmul (tau=0.4, q18 "
    "margin rule). ALL arithmetic that decides membership — plane "
    "dots, pair dots, norms-squared — is exact BIGINT over the "
    "micro-quantized components (|pair dot| <= ~2.1e13 < 2^53), so "
    "candidates AND cosines are engine-, partitioning-, and "
    "summation-order-independent — which is what makes an LSH "
    "pipeline SQL-oracle-checkable at all. Scale shape: signatures "
    "are row-level (zero shuffle); ONE shuffle of O(16n) ~530 B "
    "signature+vector rows groups each (band, sig) bucket; the "
    "~b/2^s candidate-pair stream (a FIXED 16x8 config MEASURED "
    "6.85% of all pairs, scale-constant at 1x/3x/10x — exponent "
    "2.00, RPLSH_EXPONENT.json: a 16x constant cutdown of n^2, not "
    "sub-quadratic; the textbook n^1.66 curve requires band bits "
    "~log n and band count ~n^0.66, which derive_banding now "
    "implements; the round-7 scale smoke caught 4-bit bands "
    "admitting 23%) is "
    "generated AND killed inside the bucket's numpy block matmul — "
    "it never hits a shuffle, an Arrow channel, or a per-pair "
    "expression eval. Only tau-survivors (true near-dups) leave the "
    "worker. Round 10: banding is SIZE-DRIVEN (derive_banding: bits "
    "8+e, bands [16,26,41]<<2*(e//3), e = doublings past the 2048 "
    "anchor — the oracle derives the identical values in SQL from "
    "COUNT(*)), so the candidate rate now FALLS with corpus size "
    "(10x tier: 104x12, floor 2.5% vs the fixed config's 6.85% — "
    "measured, RPLSH_EXPONENT.json) on the n^(1+rho) curve instead "
    "of the fixed-config quadratic; the one extra cost is a "
    "metadata-cheap COUNT(*) stats pass. Hot buckets "
    "(skewed/degenerate corpora where one "
    "(band, sig) bucket holds a large fraction of n) are SALTED: a "
    "tiny (band, sig) count agg finds buckets past _HOT_BUCKET_ROWS, "
    "their rows split into k = ceil(n_bucket/threshold) deterministic "
    "hash sub-buckets, and each row replicates to its k salt-PAIR "
    "groups so every candidate pair lands in exactly ONE group — "
    "per-worker residency is bounded at ~2x threshold rows however "
    "big the bucket, while the emitted pair set is provably identical "
    "to the unsalted plan (same oracle).",
)
def z13974_rplsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-8 rewrite, driven by the 10x scale smoke. The old plan
    # materialized the candidate PAIR set (~6% of all pairs), distinct()-ed
    # it, then attached both 64-dim vectors via two shuffle joins whose
    # build side quietly crosses the 10 MB autoBroadcast threshold right
    # around the 10x tier, and paid three interpreted 64-element
    # higher-order folds per pair (Catalyst evaluates aggregate/zip_with
    # lambdas per ELEMENT; profiled at ~95% of the 10x cost — and the
    # flat 64-term codegen expression is 10x worse again, falling off the
    # codegen fast path like the signature kernel's literal tree did).
    # Now each (band, sig) bucket is verified locally in one Arrow batch:
    # an int64 Gram matmul over the quantized vectors, blocked so the
    # float cosine buffer stays O(_VERIFY_BLOCK^2) regardless of bucket
    # size. Exactness: integer dots are exact and order-free; norms are
    # IEEE sqrt of exact integers; cosine divides exact-integer-valued
    # doubles — bit-identical on any engine, so the oracle computes the
    # same quantized cosine (values shift vs the raw-double cosine only
    # at ~1e-6, far inside the fixtures' 1e-4 tau margin, so membership
    # and recall are unchanged). 10x-tier: 73 s (r7) -> ~1.5 s warm.
    #
    # Round 10: the banding derives from the corpus size via ONE
    # metadata-cheap COUNT(*) stats pass (parquet count-star reads
    # footers, not data — the standard AQE-style trade, same class as
    # the salting's count agg), so the config rides the n^(1+rho)
    # schedule instead of a fixed point; fixture corpora (<= 2048)
    # derive exactly the measured 16x8 anchor.
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bands, bits = derive_banding(n)
    sigs = _rp_signatures(emb, bands, bits)
    # Consolidated verify-group count: bands*n signature rows split
    # into ~16k-row frames (floor 32 keeps fixture runs parallel).
    n_groups = max(32, -(-bands * n // _ROWS_PER_VERIFY_GROUP))
    return _salted_bucket_verify(
        sigs, _VERIFY_BLOCK, _RP_TAU, _HOT_BUCKET_ROWS, n_groups
    )


_VERIFY_BLOCK = 2048
# A bucket past this many rows is salted into ceil(n/threshold)
# sub-buckets. 16384 rows x ~530 B is a ~9 MB Arrow group and a
# ~1.7e10-int-op Gram verify — seconds on one core, well inside any
# executor budget; below it, salting would only add replication for
# buckets a single worker already handles comfortably.
_HOT_BUCKET_ROWS = 16384


def _rp_signatures(
    emb: DataFrame, n_bands: int = _N_BANDS, band_bits: int = _BAND_BITS
) -> DataFrame:
    """(vec_id, vq, band, sig): one row per vector per band — the bn
    row-level (zero-shuffle) signature stream q74 buckets on. Defaults
    to the 16x8 anchor geometry; z874 passes derive_banding(count)."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v")).withColumn(
        "vq",
        F.transform("v", lambda x: F.floor(x * 1e6 + 0.5).cast("long")),
    )
    return base.select(
        "vec_id",
        "vq",
        F.posexplode(_band_sigs_udf(n_bands, band_bits)(F.col("vq"))).alias(
            "band", "sig"
        ),
    )


def _salted_groups(sigs: DataFrame, hot_rows: int) -> DataFrame:
    """Assign every signature row its salted verify-group key.

    The hot-bucket mitigation (the round-8 docstring design, now code):
    a (band, sig) bucket holding more than `hot_rows` rows cannot be
    verified as ONE applyInPandas group — grouped-map semantics make the
    whole bucket a single worker's single Arrow group, O(n_bucket * d)
    resident and O(n_bucket^2 * d) on one core. So:

    - a tiny count agg (partial-agg shuffle of (band, sig, n) only — the
      wide vq column never rides it) finds the hot buckets;
    - the hot set broadcasts back (by construction it is small: at most
      16n/hot_rows entries, and real skew means FEW buckets);
    - each hot row gets salt s = xxhash64(vec_id) mod k,
      k = ceil(n_bucket/hot_rows), and replicates to the k groups
      {(min(s, j), max(s, j)) : j < k} — so a pair with salts (i, j)
      co-locates in exactly the group (min(i,j), max(i,j)) and NO other,
      making the union over groups exactly the bucket's pair set with
      zero double-emits;
    - cold buckets keep k = 1 -> the single (0, 0) group, i.e. the
      round-8 plan unchanged.

    Per-group residency is bounded by ~2*hot_rows expected rows
    regardless of bucket size. Total verify CPU stays the bucket's
    inherent O(n_bucket^2 * d) — salting spreads it over k(k+1)/2
    cores instead of one — and the shuffle replication (k x on hot rows
    only) is amortized by that same quadratic verify cost. The 2x linear
    recompute of the signature branch (counts + main) is the standard
    AQE-style stats-pass trade: strictly cheaper at scale than either
    caching 16n wide rows or adding a second wide shuffle for a window
    count.

    Round-9 refactor: the mechanism generalized to every pair-enumeration
    grouped-map kernel (the IVF cells have the identical cliff) as
    functions/skew.py::salted_pair_groups; this wrapper keeps q74's
    column contract."""
    return salted_pair_groups(sigs, ("band", "sig"), "vec_id", hot_rows).select(
        "vec_id", "vq", "band", "sig", "salt", "lo", "hi"
    )


# Expected rows per consolidated verify group (see _salted_bucket_verify):
# frames this size amortize the per-Arrow-group overhead while staying a
# ~8 MB residency bound.
_ROWS_PER_VERIFY_GROUP = 16384


def _salted_bucket_verify(
    sigs: DataFrame,
    block: int,
    tau: float,
    hot_rows: int,
    n_groups: int = 1024,
) -> DataFrame:
    """Bucket-local exact verify with CONSOLIDATED grouping (round 10).

    Size-driven banding makes buckets deliberately TINY (band bits
    ~log2 n keeps the expected random bucket at O(1) rows), so grouping
    applyInPandas per (band, sig, lo, hi) creates millions of
    one-digit-row Arrow groups and the per-group machinery dominates:
    measured 50 s at the 10x tier (104x12 -> ~200k groups) where the
    actual pair math is < 1 s. Instead, whole buckets hash into
    `n_groups` coarse groups (xxhash64 of the full bucket key, so a
    bucket never splits), and the kernel run-splits each frame in
    numpy: ONE lexsort + ONE matrix stack per frame, then a per-run
    Gram verify over array slices — per-bucket cost drops from a
    pandas group (~0.2 ms) to a numpy slice (~10 us). Emitted pairs
    and cosines are bit-identical to the per-bucket plan: same sorted
    id order, same int64 Gram, same IEEE cosine, same salt rule
    (measured + asserted by the forced-k equality tests).

    Callers size n_groups ~ ceil(total_sig_rows / _ROWS_PER_VERIFY_GROUP)
    (z874 derives it from n and the banding), keeping per-frame
    residency flat at any corpus size; the default suits fixture-scale
    inputs and tests."""
    salted = salted_pair_groups(
        sigs.select("vec_id", "vq", "band", "sig"),
        ("band", "sig"),
        "vec_id",
        hot_rows,
    )
    gid = F.pmod(F.xxhash64("band", "sig", "lo", "hi"), F.lit(n_groups))
    return (
        salted.withColumn("gid", gid)
        .groupBy("gid")
        .applyInPandas(
            _bucket_batch_verifier(block, tau),
            schema="id_a long, id_b long, cos double",
        )
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_sim"))
        .distinct()
    )


def _gram_core(block: int, tau: float):
    """Blocked exact-integer cosine verify over PRE-SORTED arrays:
    core(ids, vq, keep2) -> (id_a, id_b, cos) arrays or None. `ids`
    must be ascending; `keep2(ii, jj)` (sorted-index pairs) applies any
    extra pair filter (the salt rule), or None for all-pairs. The Gram
    matmul runs in int64 (exact — order-independent), blocked so the
    float64 cosine buffer is bounded however large the bucket; CPU
    stays O(n_bucket^2 * d), the LSH bucket's inherent cost. Closure
    (cloudpickle by value — the non-repo-cwd driver-sim contract)."""

    def core(ids, vq, keep2):
        n = len(ids)
        nrm = np.sqrt(np.einsum("ij,ij->i", vq, vq).astype(np.float64))
        out_a, out_b, out_c = [], [], []
        for i0 in range(0, n, block):
            ai = vq[i0 : i0 + block]
            for j0 in range(i0, n, block):
                gram = ai @ vq[j0 : j0 + block].T
                cos = gram / np.outer(
                    nrm[i0 : i0 + block], nrm[j0 : j0 + block]
                )
                ii, jj = np.nonzero(cos >= tau)
                keep = (i0 + ii) < (j0 + jj)  # ids sorted: index == id order
                if keep2 is not None:
                    keep &= keep2(i0 + ii, j0 + jj)
                ii, jj = ii[keep], jj[keep]
                if len(ii):
                    out_a.append(ids[i0 + ii])
                    out_b.append(ids[j0 + jj])
                    out_c.append(cos[ii, jj])
        if not out_a:
            return None
        return (
            np.concatenate(out_a),
            np.concatenate(out_b),
            np.concatenate(out_c),
        )

    return core


def _bucket_batch_verifier(block: int, tau: float):
    """Kernel for one CONSOLIDATED verify frame: many complete
    (band, sig, lo, hi) buckets. Run-splits in numpy and applies the
    salt rule per run (a lo != hi run is the cross group of two
    sub-buckets: only different-salt pairs may be emitted — equal-salt
    pairs belong to their diagonal group). Closure, by-value pickling."""
    core = _gram_core(block, tau)

    def verify_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        band = pdf["band"].to_numpy()
        sig = pdf["sig"].to_numpy()
        lo = pdf["lo"].to_numpy()
        hi = pdf["hi"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        order = np.lexsort((ids, hi, lo, sig, band))
        band, sig, lo, hi, ids = (
            band[order],
            sig[order],
            lo[order],
            hi[order],
            ids[order],
        )
        vq = np.stack(pdf["vq"].to_numpy()[order]).astype(np.int64)
        salts = pdf["salt"].to_numpy()[order]
        bounds = (
            np.flatnonzero(
                (band[1:] != band[:-1])
                | (sig[1:] != sig[:-1])
                | (lo[1:] != lo[:-1])
                | (hi[1:] != hi[:-1])
            )
            + 1
        )
        starts = np.concatenate(([0], bounds, [n]))
        out_a, out_b, out_c = [], [], []
        for a, b in zip(starts[:-1], starts[1:]):
            if b - a < 2:
                continue
            if lo[a] != hi[a]:
                # core indexes relative to the slice it receives, and
                # s is the matching slice — same coordinate system
                s = salts[a:b]
                keep2 = lambda ii, jj, s=s: s[ii] != s[jj]  # noqa: E731
            else:
                keep2 = None
            got = core(ids[a:b], vq[a:b], keep2)
            if got is not None:
                out_a.append(got[0])
                out_b.append(got[1])
                out_c.append(got[2])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return verify_frame


def _bucket_verifier(block: int, tau: float):
    """Single-bucket verify kernel with the salted_apply_pairs
    (pdf, pair_keep) contract — kept for the fine-grained path's API
    (IVF-style one-group-per-frame callers and the kernel unit tests);
    q74's production plan uses the consolidated _bucket_batch_verifier.
    Factory form so tests can drive tiny block sizes; closure so
    cloudpickle ships it by value (driver-sim contract)."""
    core = _gram_core(block, tau)

    def verify_bucket(pdf: pd.DataFrame, pair_keep) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        order = np.argsort(pdf["vec_id"].values, kind="stable")
        ids = pdf["vec_id"].values[order]
        vq = np.stack(pdf["vq"].values[order]).astype(np.int64)
        got = core(
            ids, vq, lambda ii, jj: pair_keep(order[ii], order[jj])
        )
        if got is None:
            return empty
        return pd.DataFrame(
            {"id_a": got[0], "id_b": got[1], "cos": got[2]}
        )

    return verify_bucket


# --------------------------------------------------------------------------
# Y63 — nearest-centroid classification audit (exact-decimal distances)
# --------------------------------------------------------------------------
@register(
    "z117237_nearest_centroid",
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
def z117237_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
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
