"""North-star LLM-pipeline operators: SURVEY.md §2.11 Q59-Q62, X15 + the
distributed MinHash-LSH near-dup path.

The reference repo has no code (SURVEY.md §0); these are the
training-data-pipeline macro-operators mandated by BASELINE.json: exact
dedup, near-dup detection, top-k similarity search, text statistics,
TF-IDF.

Numeric discipline:
- Jaccard thresholds are integer cross-multiplications (5*inter >= 4*union
  for tau=0.8) — the fixture has pairs EXACTLY on rational thresholds, so
  float division is forbidden on both engines.
- Cosine ranks are float-safe: measured min top-8 neighbor gap is 1.9e-5,
  ~10 orders above summation-order noise.

Scale posture per query is documented on each docstring; the common theme:
dedupe keys are hashes (small shuffle payload), near-dup candidates come
from LSH band buckets (equi-join, no all-pairs), similarity search does
partition-local top-k before the global one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.skew import salted_apply_pairs, salted_pair_groups
from ..sources.tables import load_table
from .registry import register

# MinHash parameters: 64 hashes = 16 bands x 4 rows. At the corpus'
# near-dup tau (shingle-Jaccard 0.8, real pairs >=0.89) the per-pair miss
# probability is (1 - J^4)^16 <= 1.4e-7 — across the fixture's 25 true
# pairs the chance of any miss is ~4e-6, so the banded pipeline is
# exact-equal to brute force (asserted in tests and by the shared
# oracle). 128 hashes would push it to 2e-14 at ~2x the signature cost;
# 64 keeps the whole sf0.1 pipeline inside the per-query time budget.
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = 4
SHINGLE_K = 3
# tau = 0.8 as the integer ratio test: 5*inter >= 4*union
TAU_NUM, TAU_DEN = 4, 5
# Similarity-search probe budget: a FIXED count (not a modulus of the
# corpus), so the broadcast probe matrix is O(N_PROBES * dim) at any scale.
N_PROBES = 50


def shingle_expr(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles of a PRE-BOUND token-array column.

    Word-set Jaccard is degenerate on a small vocabulary (95% of fixture
    pairs share >=30% of words); k-shingles of the token SEQUENCE separate
    true near-dups (J >= 0.89) from noise (J <= 0.15) bimodally.

    The tokens MUST be a materialized column, not an inline split(...):
    this expression references the array 1+k times, and inlining the
    split makes every element_at re-split the text — O(len^2) per doc
    (measured 10x slowdown at sf0.1).
    """
    n = F.size(toks)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(k)]
    )
    return F.array_distinct(
        F.when(n >= k, F.transform(F.sequence(F.lit(0), n - k), mk)).otherwise(
            F.array().cast("array<string>")
        )
    )


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sh) with sh = distinct k-shingle array. Two-step
    projection keeps split() evaluated once (CollapseProject does not
    inline a multiply-referenced non-trivial expression)."""
    return docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", shingle_expr(F.col("toks"), k).alias("sh"))


# Shared DuckDB oracle for both near-dup forms: brute-force shingle
# Jaccard with the integer threshold test.
_NEARDUP_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),
                              i -> string_split(text,' ')[i] || ' ' ||
                                   string_split(text,' ')[i+1] || ' ' ||
                                   string_split(text,' ')[i+2])) AS sh
      FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) AS inter_size,
             len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS union_size
      FROM t a JOIN t b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(inter_size AS INT) AS inter_size,
           CAST(union_size AS INT) AS union_size
    FROM pairs
    WHERE 5 * inter_size >= 4 * union_size
"""


# --------------------------------------------------------------------------
# Q59 — exact dedupe (normalized-text hash, keep-first)
# --------------------------------------------------------------------------
@register(
    "z11659_exact_dedupe",
    oracle="""
    WITH d AS (SELECT doc_id, lang, source,
                      md5(lower(trim(text))) AS text_key
               FROM documents),
         r AS (SELECT doc_id, lang, source, text_key,
                      ROW_NUMBER() OVER (PARTITION BY text_key
                                         ORDER BY doc_id) AS rn,
                      CAST(COUNT(*) OVER (PARTITION BY text_key) AS BIGINT)
                        AS n_copies
               FROM d)
    SELECT doc_id, lang, source, text_key, n_copies FROM r WHERE rn = 1
    """,
    doc="Exact dedupe: keep the lowest doc_id per md5(normalized text), "
    "reporting the duplicate count. The shuffle key is the 16-byte hash, "
    "not the document body — at 100 TB the exchange carries hashes + ids "
    "only (SURVEY §2.11 Q59, composition of Q31).",
)
def z11659_exact_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "lang", "source", F.md5(F.lower(F.trim("text"))).alias("text_key")
    )
    w = Window.partitionBy("text_key")
    return (
        keyed.withColumn("rn", F.row_number().over(w.orderBy("doc_id")))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "text_key", "n_copies")
    )


# --------------------------------------------------------------------------
# Q60 — near-dup detection, brute-force reference form (TEST-ONLY)
# --------------------------------------------------------------------------
# Deliberately NOT registered (VERDICT r2 "What's wrong" #2): this form
# collects the shingled corpus to the driver, which is a fixture-tier
# cross-check, not a plan that survives 100 TB. The registered Q60 family
# is z11660_minhash_lsh + z10660_simhash (fully distributed, same shared
# oracle); tests/test_properties.py keeps this brute force as an
# independent equivalence witness against both.
def q60_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    import bisect

    docs = doc_shingles(load_table(spark, sf_dir, "documents"))
    rows = docs.collect()
    # Broadcast sorted by set size: J >= tau forces |B|/|A| within
    # [tau, 1/tau], so each probe only scans a size window (exact
    # pruning, no false negatives).
    by_size = sorted(
        (len(r["sh"]), r["doc_id"], frozenset(r["sh"])) for r in rows
    )
    bc = spark.sparkContext.broadcast(by_size)
    tau = TAU_NUM / TAU_DEN

    schema = "id_a bigint, id_b bigint, inter_size int, union_size int"

    def gen(batches):
        all_docs = bc.value
        sizes = [s for s, _, _ in all_docs]
        for pdf in batches:
            out = {"id_a": [], "id_b": [], "inter_size": [], "union_size": []}
            for id_a, sh_a in zip(pdf["doc_id"], pdf["sh"]):
                set_a = frozenset(sh_a)
                lo = bisect.bisect_left(sizes, int(tau * len(set_a)))
                hi = bisect.bisect_right(sizes, int(len(set_a) / tau) + 1)
                for size_b, id_b, set_b in all_docs[lo:hi]:
                    if id_b <= id_a:
                        continue
                    inter = len(set_a & set_b)
                    union = len(set_a) + size_b - inter
                    if TAU_DEN * inter >= TAU_NUM * union:
                        out["id_a"].append(id_a)
                        out["id_b"].append(id_b)
                        out["inter_size"].append(inter)
                        out["union_size"].append(union)
            yield pd.DataFrame(out).astype(
                {"id_a": "int64", "id_b": "int64",
                 "inter_size": "int32", "union_size": "int32"}
            )

    return docs.mapInPandas(gen, schema)


# --------------------------------------------------------------------------
# Q60b — near-dup detection, distributed MinHash-LSH pipeline (scale path)
# --------------------------------------------------------------------------
@register(
    "z11660_minhash_lsh",
    oracle=_NEARDUP_ORACLE,
    doc="The 100 TB near-dup pipeline, fully distributed (no collect): "
    "shingle -> 64 seeded xxhash64 minhashes (one shuffle: min per "
    "doc) -> 16 band hashes -> explode -> self-equi-join on "
    "(band, band_hash) buckets -> distinct candidate pairs -> exact "
    "Jaccard verify on candidates only. All-pairs never materializes; "
    "candidates are an equi-join Catalyst optimizes like any other. "
    "With 16 bands x 4 rows the miss probability per true pair "
    "(J >= 0.89) is <= 1.4e-7 — across the fixture's true pairs the "
    "any-miss chance is ~4e-6, so the result is exact-equal to the "
    "brute-force oracle (SURVEY §2.11 Q60, §4 similarity-join row; "
    "parameter rationale at the module header).",
)
def z11660_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = doc_shingles(load_table(spark, sf_dir, "documents"))
    # (doc_id, shingle) exploded — the only row-multiplying step, bounded
    # by shingles-per-doc (~tokens-per-doc). explode_OUTER on purpose:
    # plain explode makes the optimizer infer a size(sh)>0 pre-filter and
    # inline the whole shingle expression into it, re-splitting the text
    # per element (the O(len^2) trap again); the outer form infers
    # nothing and the null rows are dropped cheaply afterwards.
    sh = docs.select("doc_id", F.explode_outer("sh").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )

    # ONE string hash per shingle, then N_HASHES derived hashes by
    # re-hashing the 8-byte value with per-seed salts. Hashing the string
    # once per seed was the hot spot (string bytes dominate xxhash64
    # cost); hashing a fixed 8+4 byte input is ~free, and unlike
    # multiply-add mixing it cannot hit ANSI-mode overflow errors.
    base = F.xxhash64("shingle")
    hashed = sh.select(
        "doc_id",
        *[
            F.xxhash64(base, F.lit(seed)).alias(f"h{seed}")
            for seed in range(N_HASHES)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(N_HASHES)]
    )

    # Band hashes: xxhash64 over each band's 4 signature values.
    bands = sig.select(
        "doc_id",
        F.array(
            *[
                F.xxhash64(
                    *[F.col(f"h{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                    F.lit(b),
                )
                for b in range(N_BANDS)
            ]
        ).alias("band_hashes"),
    ).select("doc_id", F.posexplode("band_hashes").alias("band", "band_hash"))

    # Candidate pairs: ONE shuffle groups doc_ids per (band, bucket) and
    # an array comprehension emits the in-bucket pairs. A literal
    # bucket-key self-join would recompute the entire signature pipeline
    # for each join side (no exchange reuse across differently-aliased
    # branches) — measured 18s vs ~6s for this form at sf0.1. Bucket
    # sizes are tiny (collisions only), so the pair expansion is bounded.
    buckets = (
        bands.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    candidates = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    return verify_jaccard_candidates(docs, candidates)


def verify_jaccard_candidates(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact Jaccard verify on (id_a, id_b) candidate pairs only: each
    pair picks up both shingle-set arrays through two doc_id joins and
    intersects them JVM-side — `array_intersect` is a hash-set
    O(|A|+|B|) per pair, inside whole-stage codegen. EXACT on the
    string shingles (no hashing, no probabilistic caveat). Still fully
    distributed, no broadcast of the corpus: only candidate pairs carry
    arrays. Shared by the MinHash-LSH and prefix-filtered exact paths.

    Shape history (r11, all bit-identical-output measurements): the
    r10-era pandas set-ops UDF verify paid an Arrow round trip of the
    full string arrays per pair — 31-43 s cold / ~6-8 s warm at the
    26x tier's 1.13M candidates vs ~5 s for this form (python workers
    make it cold-start- and ambient-sensitive; the JVM form isn't). A
    pre-join xxhash64 narrowing (hash each doc's set to int64 ONCE,
    join the narrow arrays) won on MATERIALIZED inputs but regressed
    the live LSH plan 2.6 s -> 4.9 s warm (CONFIRMED by
    tools/adjudicate.py): `docs` is an unmaterialized shingle subtree
    re-derived per join side, and the added pre-join projection work
    lands on BOTH re-derivations while AQE loses the skinny
    projection it used to broadcast-plan. Computing the intersect
    AFTER the joins keeps the join sides as the same skinny
    (doc_id, sh) projections the r10 plan had — z660 back at 2.1-2.2 s
    warm — while the 26x PPJoin context runs 4.8-5.9 s (pandas's warm
    band) with no Arrow dependence."""
    sh_a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.select("id_a", "id_b")
        .join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "inter_size", F.size(F.array_intersect("sh_a", "sh_b")).cast("int")
        )
        .withColumn(
            "union_size",
            (F.size("sh_a") + F.size("sh_b") - F.col("inter_size")).cast("int"),
        )
        .filter(TAU_DEN * F.col("inter_size") >= TAU_NUM * F.col("union_size"))
        .select("id_a", "id_b", "inter_size", "union_size")
    )


# --------------------------------------------------------------------------
# Q60c — near-dup detection via SimHash (third dedup family)
# --------------------------------------------------------------------------
# 32-bit SimHash over shingle features. Bit j of a shingle's hash is the
# high bit of hex digit j of md5(shingle) — a formulation both engines
# compute identically as string ops. Word-level features are useless on
# this corpus (shared vocabulary -> all signatures similar); shingle
# features give true near-dups hamming <= 4 vs a noise floor at >= 6.
SIMHASH_BITS = 32
HAMMING_TAU = 4
# pigeonhole blocking: hamming <= 4 => at least one of 5 blocks identical
SIMHASH_BLOCKS = [(1, 7), (8, 7), (15, 6), (21, 6), (27, 6)]  # (start, len), 1-based

# -- SIZE-DRIVEN blocking (round 11) -----------------------------------------
# The 26x warm-standalone ladder measured fixed 5-block blocking
# super-linear across tiers (6.0x at 10x data -> 24.4x at 26x): a
# single ~6-bit block key admits a scale-CONSTANT fraction of all pairs
# as random collisions — the same quadratic-with-a-constant regime the
# r9 exponent measurement proved for fixed RP-LSH banding. The fix is
# the standard multi-table Hamming-search construction (Manku et al.,
# WWW'07, public knowledge): split the signature into B blocks and, for
# EVERY 4-subset T of blocks, bucket on the signature with T's bits
# masked out. A pair at hamming <= HAMMING_TAU has its error bits in at
# most 4 blocks, so the subset covering them yields an identical masked
# key — candidate generation stays EXACT (deterministic pigeonhole, no
# recall loss at any size), while the bucket key grows to
# 32*(B-4)/B bits: ~6.4 at B=5, 16 at B=8, ~17.8 at B=9. B is derived
# from the corpus row count (the derive_banding posture): B = 5 at the
# anchor (where the C(5,4) = 5 keep-one-block masks are EXACTLY the
# legacy single-block buckets, so every fixture artifact is unchanged)
# and B = 5 + e past it, at the cost of C(B,4) replicas per doc in the
# bucket shuffle (tiny rows: two longs + an int). The query's OUTPUT is
# the hamming <= 4 relation over the same 32-bit signatures at every
# corpus size — only the candidate plan is size-driven, so the
# brute-force oracle needs no derivation at all.
SIMHASH_ANCHOR = 8192  # next power of two above the largest fixture corpus
# B = 12 keys 21.3 bits and replicates C(12,4) = 495x — past e = 7 the
# key gain per step stalls while replication keeps growing: the honest
# move is a WIDER signature, not more blocks. No silent caps: raise.
SIMHASH_MAX_E = 7


def _simhash_block_masks(n_blocks: int) -> list[int]:
    """Integer bit-masks (over the 32-bit signature, bit 1 = MSB) for
    ``n_blocks`` contiguous blocks. B = 5 is the bit-frozen legacy
    geometry (SIMHASH_BLOCKS — artifacts depend on it); other B use the
    balanced floor split."""
    if n_blocks == 5:
        blocks = SIMHASH_BLOCKS
    else:
        bounds = [SIMHASH_BITS * i // n_blocks for i in range(n_blocks + 1)]
        blocks = [
            (bounds[i] + 1, bounds[i + 1] - bounds[i])
            for i in range(n_blocks)
        ]
    return [
        ((1 << ln) - 1) << (SIMHASH_BITS - (start - 1) - ln)
        for start, ln in blocks
    ]


def derive_simhash_blocking(n_docs: int) -> list[int]:
    """Keep-masks for the size-driven pigeonhole blocking: one mask per
    4-subset of the B(n) blocks, keeping every bit OUTSIDE the subset.
    Bucketing on (mask_id, sig & mask) is exact for hamming <= 4 at any
    B >= 5; at B = 5 the masks are precisely the five legacy
    single-block keys."""
    from itertools import combinations

    e = 0
    while (SIMHASH_ANCHOR << e) < n_docs:
        e += 1
    if e > SIMHASH_MAX_E:
        raise ValueError(
            f"simhash blocking needs B = {5 + e} blocks for n_docs="
            f"{n_docs} > the B = {5 + SIMHASH_MAX_E} cap — widen the "
            "signature (SIMHASH_BITS) instead of adding blocks"
        )
    masks = _simhash_block_masks(5 + e)
    total = (1 << SIMHASH_BITS) - 1
    keeps = []
    for t in combinations(range(5 + e), HAMMING_TAU):
        dropped = 0
        for i in t:
            dropped |= masks[i]
        keeps.append(total ^ dropped)
    return keeps

_HEX_HIGH = "('8','9','a','b','c','d','e','f')"


def _simhash_oracle() -> str:
    bit = (
        "CASE WHEN SUM(CASE WHEN substr(md5(s), {j}, 1) IN " + _HEX_HIGH +
        " THEN 1 ELSE -1 END) >= 0 THEN '1' ELSE '0' END"
    )
    sig = " || ".join(bit.format(j=j) for j in range(1, SIMHASH_BITS + 1))
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),
                              i -> string_split(text,' ')[i] || ' ' ||
                                   string_split(text,' ')[i+1] || ' ' ||
                                   string_split(text,' ')[i+2])) AS sh
      FROM documents),
    feats AS (SELECT doc_id, unnest(sh) AS s FROM t),
    sig AS (SELECT doc_id, {sig} AS simhash FROM feats GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_filter(range(1, {SIMHASH_BITS + 1}),
                    i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1)))
                AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE len(list_filter(range(1, {SIMHASH_BITS + 1}),
              i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1)))
          <= {HAMMING_TAU}
    """


@register(
    "z10660_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup detection — the third dedup family (exact Q59, "
    "MinHash z11660_minhash_lsh, SimHash here): 32-bit signature = sign of "
    "per-bit +-1 sums over shingle md5 bits, pairs at hamming <= 4. "
    "Distributed shape mirrors the MinHash pipeline: one shuffle builds "
    "signatures; SIZE-DRIVEN pigeonhole blocking "
    "(derive_simhash_blocking — hamming <= 4 over B(n) blocks forces an "
    "identical masked signature for some 4-subset mask; B = 5 at the "
    "anchor reproduces the legacy single-block buckets bit-exactly) "
    "buckets candidates via equi-join on (mask_id, sig & mask); verify "
    "is bit_count(xor) on the 32-bit signatures — no all-pairs "
    "anywhere, and candidate generation is EXACT at every corpus size "
    "(deterministic pigeonhole, unlike tuned-recall LSH) "
    "(SURVEY §2.11 Q60 family).",
)
def z10660_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    # metadata-cheap parquet count drives the blocking schedule (the
    # q560/derive_banding posture); the result set is size-invariant
    keep_masks = derive_simhash_blocking(raw.count())
    docs = doc_shingles(raw)
    feats = docs.select("doc_id", F.explode_outer("sh").alias("s")).filter(
        F.col("s").isNotNull()
    )
    # one md5 per shingle; bit j = high bit of hex digit j. The oracle
    # reads it as substr(md5, j, 1) IN ('8'..'f'); here the same bit
    # comes from conv'ing each 8-digit hex chunk to a long once and
    # shifting — 4 string ops + 32 long ops per shingle instead of 32
    # substring/IN string ops (measured 4.7 s -> 1.5 s for the
    # signature stage at sf0.1; bit-equivalence verified offline).
    md5c = F.md5("s")
    chunks = [
        F.conv(F.substring(md5c, 1 + 8 * k, 8), 16, 10).cast("long")
        for k in range(SIMHASH_BITS // 8)
    ]
    contrib = feats.select(
        "doc_id",
        *[
            (
                F.shiftright(
                    chunks[(j - 1) // 8], 4 * (7 - ((j - 1) % 8)) + 3
                ).bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"b{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ],
    )
    sig = contrib.groupBy("doc_id").agg(
        F.concat(
            *[
                F.when(F.sum(f"b{j}") >= 0, "1").otherwise("0")
                for j in range(1, SIMHASH_BITS + 1)
            ]
        ).alias("simhash")
    )
    sig = sig.withColumn(
        "sig_int", F.conv("simhash", 2, 10).cast("long")
    )

    # size-driven pigeonhole blocking -> bucket pair generation (same
    # shape as the MinHash band buckets: one groupBy,
    # array-comprehension pairs). Bucket key = (mask_id, sig & mask);
    # at the fixture anchor the masks are the five legacy single-block
    # keys, so the buckets — and the verified pair set — are unchanged.
    blocks = sig.select(
        "doc_id",
        "sig_int",
        F.posexplode(
            F.array(
                *[
                    F.col("sig_int").bitwiseAND(F.lit(m))
                    for m in keep_masks
                ]
            )
        ).alias("block", "block_val"),
    )
    buckets = (
        blocks.groupBy("block", "block_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "sig_int"))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) -> "
                    "transform(slice(members, i + 2, size(members) - i - 1), "
                    "y -> struct(x.doc_id AS id_a, y.doc_id AS id_b, "
                    "x.sig_int AS sig_a, y.sig_int AS sig_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= HAMMING_TAU)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# Q61 — top-k similarity search (probe set over embeddings)
# --------------------------------------------------------------------------
@register(
    "z11661_topk_similarity",
    oracle="""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe
                    FROM embeddings ORDER BY vec_id LIMIT 50),
         sims AS (SELECT probe_id, e.vec_id AS neighbor_id,
                         list_dot_product(CAST(pe AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(pe AS DOUBLE[]),
                                                  CAST(pe AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[]))))
                           AS cos
                  FROM probes JOIN embeddings e ON e.vec_id <> probe_id),
         ranked AS (SELECT probe_id, neighbor_id, cos,
                           ROW_NUMBER() OVER (PARTITION BY probe_id
                                              ORDER BY cos DESC, neighbor_id)
                             AS rank
                    FROM sims)
    SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= 5
    """,
    doc="Top-5 cosine neighbors for each of a FIXED-SIZE probe set (the "
    "50 lowest vec_ids — r2 verdict item 5: a modulus-defined probe set "
    "grows with the corpus, making the broadcast O(n/100); a LIMIT-"
    "defined set keeps the broadcast at 50 x dim doubles = ~26 KB "
    "forever). The probe matrix is broadcast; mapInPandas computes one "
    "matmul per Arrow batch and emits only the per-partition top-5 per "
    "probe, then a window takes the global top-5 — rows after the map "
    "stage are partitions x probes x 5, independent of corpus size. "
    "Rank order is float-safe: measured min top-8 gap 1.9e-5 >> ulp "
    "noise (SURVEY §2.11 Q61).",
)
def z11661_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..functions.vectors import normalized_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    # bounded collect: exactly N_PROBES rows regardless of corpus size
    probe_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(N_PROBES).collect()
    )
    probe_ids, probe_mat = normalized_matrix(probe_rows, "vec_id", "embedding")
    bc = spark.sparkContext.broadcast((probe_ids, probe_mat))
    k = 5

    schema = "probe_id bigint, neighbor_id bigint, cos double"

    def gen(batches):
        p_ids, p_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].values).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            m /= norms
            sims = m @ p_mat.T  # (batch, n_probes)
            n_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for pi, pid in enumerate(p_ids):
                col = sims[:, pi]
                mask = n_ids != pid  # exclude self
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                top = idx[np.argsort(-col[idx], kind="stable")[:k]]
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": pid,
                            "neighbor_id": n_ids[top],
                            "cos": col[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = emb.select("vec_id", "embedding").mapInPandas(gen, schema)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
# IVF coarse quantizer, shared by z139185_ivf_topk and z139186_ivf_embedding_dedupe
# --------------------------------------------------------------------------
IVF_SAMPLE = 256


def _ivf_centroids(emb: DataFrame, nlist: int, iters: int = 8):
    """Sample-trained coarse quantizer: Lloyd iterations on a bounded,
    deterministic, hash-ordered sample (<= IVF_SAMPLE rows — inside the
    construction-collect lint budget). IVF quantizers are standardly
    trained on a sample: at 100 TB a full-corpus distributed k-means
    buys no recall for COARSE cells and was this query's dominant cost
    (r2 bench: 11.1 s, mostly the Spark ML fit; sample training removes
    the two full-table ML passes entirely)."""
    import numpy as np

    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(IVF_SAMPLE)
        .collect()
    )
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cen = m[:nlist].copy()
    for _ in range(iters):
        d = (
            (m * m).sum(1)[:, None]
            - 2.0 * (m @ cen.T)
            + (cen * cen).sum(1)[None, :]
        )
        a = d.argmin(1)
        for k in range(nlist):
            mask = a == k
            if mask.any():
                cen[k] = m[mask].mean(0)
    return cen


def _nearest_cells_udf(spark, centroids, n_assign: int):
    """Arrow-batched cell assignment: argmin squared-euclidean over the
    broadcast (nlist x dim) centroid matrix, top-n_assign cells.

    Returned marked non-deterministic (it is deterministic in fact):
    the optimizer otherwise duplicates the evaluation when a derived
    filter references the result — ivf_topk's join on
    element_at(cells, 1) planted an isnotnull(element_at(pythonUDF, 1))
    filter BELOW the projection, so every corpus row paid the centroid
    matmul twice (two ArrowEvalPython nodes over the same scan in the
    r15 before-plan). The marker pins a single evaluation; the only
    optimizations it blocks are reorderings across this (expensive)
    UDF, which are exactly the ones that duplicated it."""
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf("array<int>")
    def nearest_cells(embedding: pd.Series) -> pd.Series:
        import numpy as _np

        cen = bc.value
        m = _np.stack(embedding.values).astype(_np.float64)
        d = (
            (m * m).sum(1, keepdims=True)
            - 2.0 * (m @ cen.T)
            + (cen * cen).sum(1)[None, :]
        )
        top = _np.argsort(d, axis=1)[:, :n_assign]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return nearest_cells.asNondeterministic()


# --------------------------------------------------------------------------
# Q61b — IVF-partitioned ANN (the similarity-search scale path)
# --------------------------------------------------------------------------
def ivf_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a sample-trained Lloyd
    quantizer (256-row hash sample, fixed seed) partitions the corpus
    into nlist=16 cells; each probe searches only its nprobe=10 nearest
    cells — exact cosine within ~nprobe/nlist of the data instead of a
    full scan. This is the 100 TB path: assignments are a (cell, vec)
    table bucketed by cell, probes fan out as a tiny broadcast join on
    cell; the corpus is scanned ONCE (no ML fit passes). Approximate by
    construction; the registered z139185_ivf_topk wraps this in a driver-
    checkable recall verdict, and tests/test_properties.py asserts
    recall@5 >= 0.8 pair-for-pair (SURVEY §2.11 Q61 scale variant)."""
    import numpy as np

    from ..functions.vectors import normalized_matrix

    # nprobe=10 of 16 cells: the fixture embeddings are near-uniform
    # (label clusters barely separate), so aggressive cell pruning loses
    # recall that a clustered real-world corpus would keep. 10/16 still
    # prunes ~40% of the scanned volume while holding recall@5 >= 0.8
    # with the sample-trained quantizer (measured 0.85; asserted in
    # tests).
    NLIST, NPROBE, K = 16, 10, 5

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(emb, NLIST)
    assigned = emb.select(
        "vec_id",
        "embedding",
        F.element_at(_nearest_cells_udf(spark, centroids, 1)("embedding"), 1).alias(
            "cell"
        ),
    )

    # Probes: rank cells by centroid cosine, keep nprobe (driver-side
    # math on a nlist x dim matrix — tiny by construction).
    centroids = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probe_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(N_PROBES).collect()
    )
    probe_ids, probe_mat = normalized_matrix(probe_rows, "vec_id", "embedding")
    cell_rank = np.argsort(-(probe_mat @ centroids.T), axis=1)[:, :NPROBE]
    probe_cells = spark.createDataFrame(
        [
            (int(pid), int(cell))
            for pid, cells in zip(probe_ids, cell_rank)
            for cell in cells
        ],
        "probe_id bigint, cell int",
    )
    bc = spark.sparkContext.broadcast((probe_ids, probe_mat))

    # Candidates = vectors in any probed cell (equi-join on cell).
    cand = (
        F.broadcast(probe_cells)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "embedding")
    )

    @F.pandas_udf("double")
    def cos_to_probe(probe_id: pd.Series, embedding: pd.Series) -> pd.Series:
        import numpy as _np

        p_ids, p_mat = bc.value
        lookup = {int(p): i for i, p in enumerate(p_ids)}
        m = _np.stack(embedding.values).astype(_np.float64)
        m /= _np.maximum(_np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        rows = _np.array([lookup[int(p)] for p in probe_id])
        return pd.Series(_np.einsum("ij,ij->i", m, p_mat[rows]))

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("cos", cos_to_probe("probe_id", "embedding"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


@register(
    "z139185_ivf_topk",
    oracle=f"""
    WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
               FROM embeddings ORDER BY vec_id LIMIT {N_PROBES}),
    r AS (SELECT p.probe_id, e.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY p.probe_id ORDER BY
              list_dot_product(p.pv, CAST(e.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(p.pv, p.pv))
                 * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))))
              DESC, e.vec_id) AS rk
          FROM p JOIN embeddings e ON e.vec_id <> p.probe_id)
    SELECT CAST(COUNT(DISTINCT probe_id) AS INT) AS n_probes,
           CAST(5 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS recall_ge_80
    FROM r WHERE rk <= 5
    """,
    doc="Driver-checkable verdict over the IVF ANN path (r3 verdict item "
    "6, the q22 pattern): the approximate IVF top-5 (ivf_topk_approx — "
    "nlist=16, nprobe=10, sample-trained quantizer) is joined against "
    "the EXACT top-5 (z61's distributed kernel) and the measured "
    "recall@5 is emitted as a >= 0.8 boolean verdict next to exact, "
    "relationally-computed audit columns (probe count, exact pair "
    "count) the oracle recomputes independently. Approx values never "
    "enter the hashed output — only the verdict does. Cost is one "
    "extra exact-scan at fixture scale; at 100 TB this is the standard "
    "offline recall audit run on a sampled probe set.",
)
def z139185_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = z11661_topk_similarity(spark, sf_dir).select(
        "probe_id", "neighbor_id"
    )
    approx = ivf_topk_approx(spark, sf_dir).select(
        "probe_id", "neighbor_id", F.lit(1).alias("hit")
    )
    j = exact.join(approx, ["probe_id", "neighbor_id"], "left")
    return j.agg(
        F.count_distinct("probe_id").cast("int").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
    ).select(
        "n_probes",
        F.lit(5).cast("int").alias("k"),
        "n_exact",
        (F.col("n_hit") >= 0.8 * F.col("n_exact")).alias("recall_ge_80"),
    )


# --------------------------------------------------------------------------
# Q67 — embedding-cosine near-dup DEDUPE (greedy keep-lowest-id)
# --------------------------------------------------------------------------
@register(
    "z1311667_embedding_dedupe",
    oracle="""
    WITH dropped AS (
      SELECT DISTINCT b.vec_id AS vid
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
            >= 0.4)
    SELECT e.vec_id, e.label, EXISTS(SELECT 1 FROM dropped d WHERE d.vid = e.vec_id)
             AS is_dropped
    FROM embeddings e
    """,
    doc="Embedding-cosine near-dup dedupe (the fifth dedup family): any "
    "vector with cosine >= tau to a LOWER-id vector is marked dropped — "
    "greedy single-pass dedup, the standard corpus-dedup policy when "
    "full connected components are not needed. Pair generation uses the "
    "distributed chunk-pair kernel (functions/vectors.py: no driver "
    "collect, task memory 2n/C vectors, shuffle O(n*C*d)); the drop set "
    "is a tiny semi-join side. tau margin 1e-4 (see q18) "
    "(assignment dedup mandate).",
)
def z1311667_embedding_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import similarity_pairs_chunked

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity_pairs_chunked(emb, tau=0.4, spark=spark)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        emb.select("vec_id", "label")
        .join(
            dropped.withColumn("is_dropped", F.lit(True)), "vec_id", "left"
        )
        .select(
            "vec_id",
            "label",
            F.coalesce("is_dropped", F.lit(False)).alias("is_dropped"),
        )
    )


# --------------------------------------------------------------------------
# Q62 — text statistics / language slice
# --------------------------------------------------------------------------
@register(
    "z11662_text_stats",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                 FROM documents),
         tc AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
                FROM tok GROUP BY lang, token),
         top AS (SELECT lang, token AS top_token, n AS top_token_n,
                        ROW_NUMBER() OVER (PARTITION BY lang
                                           ORDER BY n DESC, token) AS rn
                 FROM tc),
         base AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
                  FROM documents GROUP BY lang)
    SELECT base.lang, n_docs, total_chars, avg_chars, top_token, top_token_n
    FROM base JOIN top ON base.lang = top.lang
    WHERE rn = 1
    """,
    doc="Per-language profile: doc count, char totals, and the most "
    "frequent token (explode -> count -> rank-1, token tie-break). "
    "Integer sums divided at the end keep avg exact "
    "(SURVEY §2.11 Q62).",
)
def z11662_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )
    tc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    top = (
        tc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("token").alias("top_token"), F.col("n").alias("top_token_n"))
    )
    return base.join(top, "lang")


# --------------------------------------------------------------------------
# X15 — TF-IDF (explode + aggregate arithmetic)
# --------------------------------------------------------------------------
@register(
    "z11784_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
         tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM tok GROUP BY doc_id, token),
         dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS doc_len
                FROM tok GROUP BY doc_id),
         df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
                FROM tok GROUP BY token),
         n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, cnt, doc_freq,
           round((CAST(cnt AS DOUBLE) / doc_len) * ln(n_docs / doc_freq), 6)
             AS tfidf
    FROM tf
    JOIN dl ON tf.doc_id = dl.doc_id
    JOIN df ON tf.token = df.token
    CROSS JOIN n
    WHERE tf.doc_id < 50
    """,
    doc="TF-IDF as pure relational algebra: term freq / doc length x "
    "ln(N / doc freq). The doc-frequency join carries NO mandatory "
    "broadcast hint: doc-freq is vocabulary-sized and vocabularies grow "
    "with corpus size (Heaps' law), so a forced build-side OOMs at the "
    "100 TB mandate — AQE promotes to broadcast when it actually fits "
    "(plan-asserted at fixture scale) and sort-merges past that. N is a "
    "one-row aggregate cross-joined in (no driver-side count; bounded, "
    "so its hint stays). Output sliced to doc_id < 50; tfidf rounded "
    "6dp (ln is not bit-portable) (SURVEY §2.11 X15).",
)
def z11784_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    df_tbl = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tf.join(dl, "doc_id")
        .join(df_tbl, "token")
        .crossJoin(F.broadcast(n))
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            "token",
            "cnt",
            "doc_freq",
            F.round(
                (F.col("cnt").cast("double") / F.col("doc_len"))
                * F.log(F.col("n_docs") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# Q69 — IVF-bucketed embedding dedupe (sub-quadratic scale path for Q67)
# --------------------------------------------------------------------------
def ivf_dedupe_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic sibling of q67: the IVF coarse quantizer (same
    sample-trained Lloyd cells as ivf_topk_approx, fixed seed) buckets
    vectors into nlist cells with MULTI-ASSIGNMENT (each vector joins
    its 3 nearest cells); one applyInPandas task per cell matmuls only
    that cell's members; survivors of the exact cosine >= tau verify
    mark greedy keep-lowest-id drops. Candidates that straddle
    non-shared cells are missed — recall 0.92 at sf0.01 on this
    NEAR-UNIFORM fixture (the IVF worst case; clustered real corpora
    pay ~n_assign*nlist^-1 of the all-pairs cost at much higher
    recall). Every emitted drop is exact-verified, so the drop set is a
    strict subset of q67's. Task memory: ~n_assign*n/nlist vectors per
    cell when assignment is balanced, and BOUNDED at ~2x
    _IVF_HOT_CELL_ROWS when it is not — clustered corpora (the
    realistic case: embeddings cluster, which is IVF's premise) can
    put a large fraction of n in one cell, the same grouped-map skew
    cliff q74's (band, sig) buckets had (round-8 verdict), so cells
    past the threshold are salted into k sub-cells with cross-sub-cell
    pairing (functions/skew.py::salted_pair_groups; pair set provably
    identical to unsalted — q74's argument). The verify matmul is
    blocked over ROWS of the pre-normalized matrix, so the similarity
    buffer is O(block^2) however big the cell while every pair's
    cosine is the same IEEE dot either way. No driver collect
    (centroids are nlist x dim) (assignment dedup mandate; the
    registered z139186_ivf_embedding_dedupe wraps this in a
    driver-checkable subset + recall verdict)."""
    NLIST, N_ASSIGN, TAU = 16, 3, 0.4

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(emb, NLIST)
    nearest_cells = _nearest_cells_udf(spark, centroids, N_ASSIGN)
    assigned = emb.select(
        "vec_id", "embedding", F.explode(nearest_cells("embedding")).alias("cell")
    )
    pairs = _ivf_cell_pairs(assigned, TAU, _IVF_BLOCK, _IVF_HOT_CELL_ROWS)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        emb.select("vec_id", "label")
        .join(dropped.withColumn("is_dropped", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("is_dropped", F.lit(False)).alias("is_dropped"),
        )
    )


_IVF_BLOCK = 2048
# Same budget rationale as q74's _HOT_BUCKET_ROWS: 16384 float64 rows x
# 64 dims is an ~8 MB Arrow group and a seconds-scale single-core
# verify; past it a cell salts into ceil(n/threshold) sub-cells.
_IVF_HOT_CELL_ROWS = 16384


def _ivf_cell_pairs(
    assigned: DataFrame, tau: float, block: int, hot_rows: int
) -> DataFrame:
    """Distinct (id_a < id_b) pairs with cosine >= tau sharing an IVF
    cell, verified cell-locally with residency bounded via hot-cell
    salting (the q74 mechanism, functions/skew.py::salted_apply_pairs).
    Factory-parameterized so tests can force the salted/multi-block
    paths the fixtures' balanced cells never reach."""
    return salted_apply_pairs(
        assigned,
        ("cell",),
        "vec_id",
        hot_rows,
        _cell_verifier(block, tau),
        "id_a bigint, id_b bigint",
    ).distinct()


def _cell_verifier(block: int, tau: float):
    """Blocked all-pairs cosine verify for one IVF cell group (CLOSURE
    — cloudpickle by value, the driver-sim contract). The salt
    exactness rule (cross groups admit only different-salt pairs) is
    applied through the `pair_keep` filter that
    functions/skew.py::salted_apply_pairs supplies — the kernel cannot
    forget it (code-review r9). Blocking is over rows of the
    once-normalized matrix — each pair's cosine is the same IEEE
    float64 dot whatever the block size."""

    def cell_pairs(pdf: pd.DataFrame, pair_keep) -> pd.DataFrame:
        import numpy as _np

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        order = _np.argsort(pdf["vec_id"].values, kind="stable")
        ids = pdf["vec_id"].values[order].astype(_np.int64)
        m = _np.stack(pdf["embedding"].values[order]).astype(_np.float64)
        norms = _np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        m /= norms
        out_a, out_b = [], []
        for i0 in range(0, n, block):
            ai = m[i0 : i0 + block]
            for j0 in range(i0, n, block):
                sims = ai @ m[j0 : j0 + block].T
                ii, jj = _np.nonzero(sims >= tau)
                keep = ids[i0 + ii] < ids[j0 + jj]
                keep &= pair_keep(order[i0 + ii], order[j0 + jj])
                ii, jj = ii[keep], jj[keep]
                if len(ii):
                    out_a.append(ids[i0 + ii])
                    out_b.append(ids[j0 + jj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": _np.concatenate(out_a),
                "id_b": _np.concatenate(out_b),
            }
        )

    return cell_pairs


@register(
    "z139186_ivf_embedding_dedupe",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dropped AS (
      SELECT DISTINCT b.vec_id AS vid
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS BIGINT) AS n_dropped_exact,
           TRUE AS subset_ok,
           TRUE AS recall_ge_80
    FROM dropped
    """,
    doc="Driver-checkable verdict over the IVF-bucketed dedupe path (r3 "
    "verdict item 6): ivf_dedupe_approx's drop set is compared against "
    "the EXACT drop set (z67's distributed chunk-pair kernel, tau=0.4) "
    "and two boolean verdicts are emitted — subset_ok (every IVF drop "
    "is exact-verified, so false drops are structurally impossible) "
    "and recall >= 0.8 (multi-assignment recovers >= 80% of true "
    "drops; measured 0.92 on the near-uniform fixture, IVF's worst "
    "case) — next to exact, relationally-computed audit counts the "
    "oracle recomputes independently. Approx values never enter the "
    "hashed output.",
)
def z139186_ivf_embedding_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = z1311667_embedding_dedupe(spark, sf_dir).select(
        "vec_id", F.col("is_dropped").alias("ex")
    )
    ivf = ivf_dedupe_approx(spark, sf_dir).select(
        "vec_id", F.col("is_dropped").alias("iv")
    )
    j = exact.join(ivf, "vec_id")
    return j.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("ex"), 1).otherwise(0)).alias("n_dropped_exact"),
        F.sum(F.when(F.col("iv") & ~F.col("ex"), 1).otherwise(0)).alias(
            "false_drops"
        ),
        F.sum(F.when(F.col("iv") & F.col("ex"), 1).otherwise(0)).alias(
            "true_drops"
        ),
    ).select(
        "n_vecs",
        "n_dropped_exact",
        (F.col("false_drops") == 0).alias("subset_ok"),
        (F.col("true_drops") >= 0.8 * F.col("n_dropped_exact")).alias(
            "recall_ge_80"
        ),
    )


# --------------------------------------------------------------------------
# X17 — exact n-gram Jaccard join, DISTRIBUTED (prefix-filtered inverted
# index) — re-adds the brute-force family q60_neardup_jaccard was demoted
# from (r2 verdict wrong-item 2), this time in a shape that survives 100 TB.
# --------------------------------------------------------------------------
def exact_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """All pairs with shingle-Jaccard >= tau, EXACTLY, with no collect and
    no all-pairs join: prefix filtering over a global rarity order
    (SSJoin/PPJoin scheme, public literature).

    Under any single global total order on shingles, if J(A,B) >= tau then
    |A ∩ B| >= ceil(tau*|A|), so A and B must share an element inside each
    one's first |X| - ceil(tau*|X|) + 1 shingles of that order (else all
    common elements sit in the last ceil(tau*|X|)-1 positions — too few).
    Ordering by ASCENDING document frequency makes the indexed 20% (at
    tau=0.8) the RAREST shingles, so inverted-index buckets stay small:
    a stop-shingle with df=10^6 only enters the index for docs where even
    their rarest shingles are ubiquitous.

    Shuffle accounting: df count (by shingle) -> per-doc rank (window by
    doc_id) -> prefix self-equi-join (by shingle, rare keys) -> exact
    verify joins (by doc_id). Four keyed shuffles, candidates only ever
    carry (id, id); arrays travel only to verify actual candidates.
    Size pruning (tau*|A| <= |B| <= |A|/tau) cuts candidates before the
    array join; integer cross-multiplication avoids float thresholds.
    """
    sized = docs.select("doc_id", "sh", F.size("sh").alias("sz"))
    toks = sized.select(
        "doc_id", "sz", F.explode_outer("sh").alias("shingle")
    ).filter(F.col("shingle").isNotNull())

    df_tbl = toks.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))

    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    # prefix length = sz - ceil(tau*sz) + 1; ceil in exact integer math
    ceil_tau_sz = (TAU_NUM * F.col("sz") + F.lit(TAU_DEN - 1)).cast("long") / F.lit(
        TAU_DEN
    )
    prefix = (
        toks.join(df_tbl, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .filter(
            F.col("pos")
            <= F.col("sz") - F.floor(ceil_tau_sz).cast("int") + F.lit(1)
        )
        .select("doc_id", "sz", "shingle")
    )

    pa = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "shingle"
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "shingle"
    )
    return (
        pa.join(pb, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # size pruning: J >= tau forces tau <= |B|/|A| <= 1/tau
            & (TAU_DEN * F.col("sz_b") >= TAU_NUM * F.col("sz_a"))
            & (TAU_DEN * F.col("sz_a") >= TAU_NUM * F.col("sz_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )


@register(
    "z12786_ngram_jaccard",
    oracle=_NEARDUP_ORACLE,
    doc="EXACT n-gram Jaccard similarity join (fourth registered near-dup "
    "family), fully distributed: prefix-filtered inverted index over a "
    "global rarity order generates candidates (no all-pairs, no "
    "collect), then the shared candidate-verify stage computes exact "
    "intersection sizes. Same oracle as z11660_minhash_lsh/z10660_simhash but "
    "with zero miss probability — this is what replaces the demoted "
    "collect-based q60_neardup_jaccard at scale (SURVEY §2.11 Q60).",
)
def z12786_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The session-memoized materialization of exactly this pipeline
    # (functions/neardup.py) — also consumed by z85/z302's clustering.
    from ..functions.neardup import verified_pairs

    return verified_pairs(spark, sf_dir)


# --------------------------------------------------------------------------
# X16 — cluster-level dedupe: transitive closure of the near-dup graph
# (distributed connected components), one canonical survivor per CLUSTER
# --------------------------------------------------------------------------
# Reusable recursive-CTE prefix: shingles -> exact-verified Jaccard
# pairs -> min-label-propagation connected components. Shared by the
# z85 cluster-dedupe oracle and the y68 quality-canonical oracle.
_CC_CTE = """
    WITH RECURSIVE t AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),
                              i -> string_split(text,' ')[i] || ' ' ||
                                   string_split(text,' ')[i+1] || ' ' ||
                                   string_split(text,' ')[i+2])) AS sh
      FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE 5 * len(list_intersect(a.sh, b.sh))
            >= 4 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    -- min-label propagation; (node,label) pairs are finite and UNION
    -- dedups, so the recursion terminates. label <= v prunes pairs that
    -- can never be a minimum (the component min is <= every member, so
    -- the min's propagation path is never pruned).
    cc(node, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) s
      UNION
      SELECT e.v, c.label FROM cc c JOIN edges e ON e.u = c.node
      WHERE c.label <= e.v),
    comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node)
"""

_CLUSTER_ORACLE = _CC_CTE + """
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS canonical_id,
           CAST(CASE WHEN c.component IS NOT NULL AND c.component <> d.doc_id
                THEN 1 ELSE 0 END AS INT) AS is_dropped
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


@register(
    "q12785_cluster_dedupe",
    oracle=_CLUSTER_ORACLE,
    doc="Cluster-level dedupe: exact near-dup pairs (x17's prefix-filtered "
    "join) -> distributed connected components (alternating large-star/"
    "small-star, functions/graph.py — O(log n) rounds, two keyed "
    "shuffles each, no neighbor lists) -> keep the component-min doc "
    "per CLUSTER. Unlike the greedy pairwise policy (q67/q69), the "
    "transitive closure drops b AND c for a~b, b~c even when a!~c. "
    "Oracle: DuckDB recursive-CTE min-label propagation over the same "
    "pair graph (LLM-pipeline mandate; r3 graph-dedup milestone).",
)
def q12785_cluster_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shared memoized pair graph + components (functions/neardup.py).
    # The graph is built from exact-VERIFIED pairs only — candidates
    # are ~170x the true pair set at sf0.1 and would over-merge
    # clusters (caught by profiling, not by the sf0.01 oracle, where
    # the candidate set happens to coincide with the true pairs).
    from ..functions.neardup import components

    docs_raw = load_table(spark, sf_dir, "documents")
    comp = components(spark, sf_dir)
    return (
        docs_raw.join(comp, docs_raw["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
            F.when(
                F.col("component").isNotNull()
                & (F.col("component") != F.col("doc_id")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_dropped"),
        )
    )


# --------------------------------------------------------------------------
# X21 — end-to-end training-corpus pipeline (the composition a user of
# this engine actually runs): quality filter -> exact dedupe -> near-dup
# dedupe, each stage the registered operator's exact logic
# --------------------------------------------------------------------------
@register(
    "z12790_corpus_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, text,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text,' '),
                  t -> t IN ('data','table','row','value','key'))) AS BIGINT)
               AS n_stop
      FROM documents),
    quality AS (
      SELECT * FROM base
      WHERE n_tokens BETWEEN 10 AND 1000
        AND CAST(n_stop AS DOUBLE)/n_tokens < 0.5),
    keyed AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
      FROM quality),
    exact_surv AS (
      SELECT doc_id, lang, source, text, n_tokens FROM keyed WHERE rn = 1),
    sh AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),
                              i -> string_split(text,' ')[i] || ' ' ||
                                   string_split(text,' ')[i+1] || ' ' ||
                                   string_split(text,' ')[i+2])) AS s
      FROM exact_surv),
    neardup_b AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE 5 * len(list_intersect(a.s, b.s))
            >= 4 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))))
    SELECT e.doc_id, e.lang, e.source, e.n_tokens
    FROM exact_surv e ANTI JOIN neardup_b n ON e.doc_id = n.doc_id
    """,
    doc="The macro-pipeline a training-data user runs end-to-end, as ONE "
    "declarative plan Catalyst optimizes whole: (1) Gopher-style "
    "quality gate (q64's keep rule), (2) exact dedupe keep-first on "
    "md5(normalized text) (q59), (3) near-dup dedupe dropping the "
    "higher id of every exact-verified Jaccard pair (x17's "
    "prefix-filtered distributed join — no collect, no all-pairs), "
    "stages pipelined with no materialization boundaries between them. "
    "Shuffle keys: hash, shingle, doc_id — never the document body "
    "except to shingle survivors (LLM-pipeline mandate capstone).",
)
def z12790_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .q_text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
    )
    quality = base.filter(
        F.col("n_tokens").between(10, 1000)
        & (F.col("n_stop").cast("double") / F.col("n_tokens") < 0.5)
    )
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    exact_surv = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "text", "n_tokens")
    )
    sh = doc_shingles(exact_surv.select("doc_id", "text"))
    dropped = (
        verify_jaccard_candidates(sh, exact_jaccard_pairs(sh))
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return exact_surv.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_tokens"
    )
