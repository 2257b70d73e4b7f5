"""Corpus-preparation macro-operators (round-3 breadth batch 2): the
remaining steps a training-data pipeline runs between raw documents and
a training mix — benchmark decontamination, chunking, per-stratum
sampling, BM25 relevance, a vocabulary/Zipf profile, k-per-stratum
downsampling, length-outlier fences, per-label embedding centroids,
sequence packing, unigram-LM perplexity-proxy scoring, and CCNet-style
cross-document boilerplate line removal.

All eleven are oracle-paired. Registry tiers (see plans/registry.py):
decontamination, packing, unigram scoring, and boilerplate removal carry
q7x names INSIDE the driver's 50-entry verification window (rotated in
during round 3 in place of r2-green unchanged core queries, now z02-z25);
the rest are y-tier, verified by the local sf0.01 parity mirror on every
pytest run like the z tier.

Cross-engine discipline (same rules as the rest of the fleet):
n-gram/chunk positions are generated with identical 1-based inclusive
semantics (Spark ``sequence``/``slice`` vs DuckDB ``range``/list
slicing, verified element-for-element); every float expression is the
same IEEE operation tree on both sides; transcendentals (BM25's ln) are
rounded to 4dp on both sides per the q47 rule."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import with_global_cumsum
from ..sources.tables import load_table
from .registry import register

# Eval-holdout rule for decontamination: a pure function of doc_id so
# both engines agree with zero coordination. ~1.9% of the corpus plays
# the role of "the benchmark" (9 docs at sf0.01).
_EVAL_MOD = 53
_NGRAM = 8  # 8-token overlap — the scale of verbatim leakage worth flagging

_CHUNK = 32  # tokens per training chunk
_STRIDE = 24  # chunk start stride (8-token overlap between neighbors)


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def _grams8(tk):
    """Distinct 8-token shingles; empty array for docs shorter than 8.

    Mirrors DuckDB ``range(1, greatest(len(tk)-6, 1))`` + list slicing:
    both enumerate starts 1..len-7 (1-based, inclusive).
    """
    n = F.size(tk)
    starts = F.when(n >= _NGRAM, F.sequence(F.lit(1), n - (_NGRAM - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_join(F.slice(tk, i, _NGRAM), " "))
    )


# --------------------------------------------------------------------------
# Q75 (was Y31) — benchmark decontamination (8-gram overlap vs a held-out eval set)
# --------------------------------------------------------------------------
@register(
    "q11775_decontaminate",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(string_split(text,' ')) - {_NGRAM - 2}, 1)),
                 i -> array_to_string(string_split(text,' ')[i:i+{_NGRAM - 1}], ' ')))
               AS grams
      FROM documents),
    ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g
           WHERE doc_id % {_EVAL_MOD} = 0),
    tr AS (SELECT doc_id, unnest(grams) AS gram FROM g
           WHERE doc_id % {_EVAL_MOD} <> 0),
    hits AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id)
    SELECT g.doc_id,
           CAST(len(g.grams) AS INT) AS n_grams,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / greatest(len(g.grams), 1)
             AS contamination,
           CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INT)
             AS contaminated
    FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
    WHERE g.doc_id % {_EVAL_MOD} <> 0
    """,
    doc="Benchmark decontamination: flag training documents sharing any "
    "8-token shingle with a held-out eval set (doc_id % 53 == 0 plays "
    "the benchmark role; in production this side is the actual eval "
    "suite). The eval n-gram set is BENCHMARK-sized, not corpus-sized — "
    "it is distinct-ed and broadcast, so the training side streams "
    "through a map-side hash join with no corpus-keyed shuffle other "
    "than the per-doc aggregation. The training side is ONE pass: "
    "explode_outer keeps sub-8-token docs as a null-gram row, a "
    "broadcast LEFT join marks contaminated grams, and a single "
    "doc-keyed aggregation produces n_grams (count of grams) and "
    "n_hits (count of marks) together — the r6 rewrite of the r3 form "
    "whose hits + join-back branches each re-evaluated the 8-gram "
    "pipeline over the 52/53 training split (measured 6.0 -> ~3 s at "
    "sf0.1). Since r12 the gram table itself is the shared memoized "
    "build (functions/grams.py, ridden by z8301): both branches read "
    "one materialized (doc_id, grams) checkpoint, which removed the "
    "double subtree evaluation behind the 18.1x cold smoke ratio. "
    "Broadcast contract, stated honestly (code-review r14): the hint "
    "encodes the PRODUCTION shape — an eval suite is a fixed benchmark "
    "set whose distinct grams are MBs, and the hint keeps the map-side "
    "join even on clusters that disable autoBroadcast. The fixture's "
    "doc_id % 53 stand-in does NOT share that property (it is 1/53 of "
    "the corpus, linear in data): feeding a corpus-sized eval side "
    "hits Spark's 8 GB broadcast hard cap, which fails LOUDLY with the "
    "table size in the message — the remedy (drop the hint, let the "
    "gram match shuffle) is a one-line change the error makes obvious.",
)
def q11775_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.grams import doc_grams8

    # Shared memoized gram table (functions/grams.py): the eval and
    # training branches below both read the ONE materialized
    # (doc_id, grams) checkpoint instead of each re-evaluating the
    # tokenize->8-gram subtree (the r12 fix for the 18.1x cold smoke
    # ratio; z8301 rides the same build).
    g = doc_grams8(spark, sf_dir)
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    ev = (
        g.filter(is_eval)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # Training branch: grams computed ONCE. explode_outer (not explode)
    # keeps empty-gram docs as a null row so count(gram) gives them
    # n_grams = 0 instead of dropping them.
    tr = g.filter(~is_eval).select(
        "doc_id", F.explode_outer("grams").alias("gram")
    )
    counts = (
        tr.join(F.broadcast(ev), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").cast("int").alias("n_grams"),
            F.count("__hit").cast("long").alias("n_hits"),
        )
    )
    return counts.select(
        "doc_id",
        "n_grams",
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.greatest("n_grams", F.lit(1))
        ).alias("contamination"),
        F.when(F.col("n_hits") > 0, 1).otherwise(0).cast("int").alias(
            "contaminated"
        ),
    )


# --------------------------------------------------------------------------
# Y32 — token-window chunking (overlapping training chunks)
# --------------------------------------------------------------------------
@register(
    "z12776_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    s AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, {_STRIDE})) AS start
          FROM t)
    SELECT doc_id,
           CAST(FLOOR((start - 1) / {_STRIDE}) AS INT) AS chunk_id,
           CAST(len(tk[start:start+{_CHUNK - 1}]) AS INT) AS n_tokens,
           array_to_string(tk[start:start+{_CHUNK - 1}], ' ') AS chunk_text
    FROM s
    """,
    doc="Overlapping token-window chunking (32-token chunks, stride 24 — "
    "8-token overlap), the standard pre-tokenization step for context-"
    "window training and RAG indexing. Pure row-level explode: start "
    "positions are sequence(1, n_tokens, stride) on both engines "
    "(inclusive upper bound verified equal), the chunk is a 1-based "
    "32-element array slice with identical tail clamping. Zero "
    "shuffles; output size is a fixed ~n_tokens/24 multiple of the "
    "input, independent of partitioning (chunking mandate).",
)
def z12776_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("tk"))
    s = t.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(F.lit(1), F.size("tk"), F.lit(_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("tk", F.col("start"), _CHUNK)
    return s.select(
        "doc_id",
        F.floor((F.col("start") - 1) / _STRIDE).cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Y33 — per-stratum deterministic sampling (applies the x30 rebalance)
# --------------------------------------------------------------------------
_EN_LT = "40"  # 64/256 = 25% of the over-represented 'en' stratum
_OTHER_LT = "c0"  # 192/256 = 75% of everything else


@register(
    "z12777_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CASE WHEN lang = 'en' THEN '{_EN_LT}' ELSE '{_OTHER_LT}' END
             AS threshold,
           CAST(CASE WHEN substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 2)
                     < CASE WHEN lang = 'en' THEN '{_EN_LT}'
                            ELSE '{_OTHER_LT}' END
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM documents
    """,
    doc="Per-stratum Bernoulli sampling with DETERMINISTIC membership: "
    "keep 25% of the over-represented 'en' stratum and 75% of every "
    "other language, decided by an md5(doc_id) prefix range as in x24 "
    "(same engine-portable property; 'strat:' salt decorrelates from "
    "the split/sample hashes). This is the APPLY step for the "
    "sampling weights x30 computes. Row-level, zero shuffle, "
    "rerun-stable on any engine and partitioning (data-mixing "
    "mandate).",
)
def z12777_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", _EN_LT).otherwise(_OTHER_LT)
    hx = F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        thr.alias("threshold"),
        F.when(hx < thr, 1).otherwise(0).cast("int").alias("kept"),
    )


# --------------------------------------------------------------------------
# Y34 — BM25 relevance scoring (fixed query-term set)
# --------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "filter")
_K1 = "1.2"
_K1P1 = "2.2"  # (k1 + 1) written as the same literal on both sides
_B = "0.75"
_1MB = "0.25"  # (1 - b), exact in binary


@register(
    "z139180_bm25",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM t),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(tk)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
              FROM t),
    tf AS (SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(tk) AS token FROM t)
           WHERE token IN {str(tuple(_BM25_TERMS))}
           GROUP BY doc_id, token),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id, tf.term, tf.tf, d.dl,
           round(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * ({_K1P1} * tf.tf)
                 / (tf.tf + {_K1} * ({_1MB} + {_B} * (d.dl / stats.avgdl))), 4)
             AS bm25
    FROM tf
    JOIN d ON tf.doc_id = d.doc_id
    JOIN df ON tf.term = df.term
    CROSS JOIN stats
    """,
    doc="BM25 (k1=1.2, b=0.75) for a fixed query-term set over the "
    "corpus — the relevance kernel of retrieval-based data curation. "
    "Shuffle inventory: one (doc, term) partial-agg for tf (pre-"
    "filtered to the query terms, so only matching tokens move), a "
    "term-keyed df agg over the tf table (|terms| rows, broadcast "
    "back), a one-row corpus-stats aggregate cross-joined (broadcast, "
    "x30 shape), and one doc-keyed join for dl. Score arithmetic is "
    "the identical IEEE operation tree on both engines with shared "
    "literals; ln rounded to 4dp per the q47 transcendental rule. "
    "Per-row output (doc, term, tf, dl, score) avoids cross-term "
    "summation-order divergence entirely.",
)
def z139180_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("tk"))
    d = t.select("doc_id", F.size("tk").cast("long").alias("dl"))
    stats = t.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(F.size("tk")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tf = (
        t.select("doc_id", F.explode("tk").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("token").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, k1p1 = float(_K1), float(_K1P1)
    b, one_minus_b = float(_B), float(_1MB)
    joined = (
        tf.join(d, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    score = (
        idf
        * (F.lit(k1p1) * F.col("tf"))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(one_minus_b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
        )
    )
    return joined.select(
        "doc_id", "term", "tf", "dl", F.round(score, 4).alias("bm25")
    )


# --------------------------------------------------------------------------
# Y35 — vocabulary / Zipf profile (top-100 tokens, rank + cumulative share)
# --------------------------------------------------------------------------
_VOCAB_TOP = 100


@register(
    "z139181_vocab_zipf",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT {_VOCAB_TOP})
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank,
           CAST(n AS DOUBLE) / t.total AS share,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / t.total AS cum_share
    FROM top CROSS JOIN t
    """,
    doc="Corpus vocabulary profile: the 100 most frequent tokens with "
    "rank, corpus share, and cumulative share (the Zipf curve a "
    "tokenizer/vocab decision reads off). The token count is a "
    "partial-agg shuffle keyed on the token; the top-100 cut is "
    "TakeOrdered (no global sort); rank/cum_share windows then run "
    "over the ALREADY-BOUNDED 100-row set (partitioned on a constant "
    "— single partition by construction, 100 rows at any corpus "
    "size, so the usual bare-window ban does not bite). total is a "
    "one-row broadcast like x30. Ties broken by token for "
    "determinism.",
)
def z139181_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").cast("long").alias("total"))
    top = c.orderBy(F.desc("n"), F.asc("token")).limit(_VOCAB_TOP)
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("n"), F.asc("token"))
    return (
        top.crossJoin(F.broadcast(t))
        .select(
            "token",
            "n",
            F.row_number().over(w).cast("int").alias("rank"),
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (
                F.sum("n")
                .over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                .cast("double")
                / F.col("total")
            ).alias("cum_share"),
        )
    )


# --------------------------------------------------------------------------
# Y36 — deterministic k-per-stratum sample (uniform downsampling)
# --------------------------------------------------------------------------
_GROUP_K = 5


@register(
    "z139182_group_sample",
    oracle=f"""
    SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
    FROM (SELECT doc_id, lang, source,
                 row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
    WHERE rn <= {_GROUP_K}
    """,
    doc="Uniform k-per-stratum downsampling: exactly 5 documents per "
    "(lang, source) stratum, chosen by ranking on md5(doc_id) — a "
    "deterministic stand-in for ORDER BY random() that every engine, "
    "partitioning, and rerun agrees on (same md5-membership idea as "
    "x24/q77, but with an exact per-group COUNT guarantee instead of "
    "a rate). Physically identical to the z31 keep-first engine: one "
    "hash-partition shuffle on the stratum key, and Spark 4's "
    "WindowGroupLimit cuts each group to k BEFORE and after the "
    "exchange, so only candidate rows move (plan-asserted).",
)
def z139182_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.concat(F.lit("gs:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= _GROUP_K)
    )


# --------------------------------------------------------------------------
# Y37 — per-stratum length-band outlier filter (p05/p95 fences)
# --------------------------------------------------------------------------
@register(
    "z139183_length_band",
    oracle="""
    WITH b AS (SELECT lang,
                      round(quantile_cont(CAST(n_chars AS DOUBLE), 0.05), 4)
                        AS lo,
                      round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4)
                        AS hi
               FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars, b.lo, b.hi,
           CAST(CASE WHEN d.n_chars >= b.lo AND d.n_chars <= b.hi
                THEN 1 ELSE 0 END AS INT) AS in_band
    FROM documents d JOIN b ON d.lang = b.lang
    """,
    doc="Length-outlier filter: per-language p05/p95 fences on document "
    "length, each document flagged in/out of band — the 'drop the "
    "truncated and the concatenated' heuristic of corpus cleaning. "
    "Exact interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont, q27 rule, rounded 4dp); the fence table is "
    "O(languages) and broadcast back onto the corpus scan, so the "
    "corpus moves only once (the percentile agg's partial pass). At "
    "100 TB swap percentile -> percentile_approx(..., 10000): same "
    "plan shape, sketch-mergeable, documented trade.",
)
def z139183_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = docs.groupBy("lang").agg(
        F.round(
            F.expr("percentile(CAST(n_chars AS DOUBLE), 0.05)"), 4
        ).alias("lo"),
        F.round(
            F.expr("percentile(CAST(n_chars AS DOUBLE), 0.95)"), 4
        ).alias("hi"),
    )
    return docs.join(F.broadcast(b), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        "lo",
        "hi",
        F.when(
            (F.col("n_chars") >= F.col("lo"))
            & (F.col("n_chars") <= F.col("hi")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("in_band"),
    )


# --------------------------------------------------------------------------
# Y38 — per-label embedding centroids (elementwise mean, order-exact)
# --------------------------------------------------------------------------
@register(
    "z139184_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                         AS DECIMAL(18,6)))) AS val
      FROM embeddings)
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val) AS DOUBLE) / COUNT(*) AS centroid
    FROM e GROUP BY label, dim
    """,
    doc="Per-label embedding centroids: the elementwise mean vector of "
    "each label's embeddings (the building block of IVF coarse "
    "training, nearest-class classification, and cluster drift "
    "monitoring). Floats are quantized to 6dp decimals BEFORE "
    "summation (round-then-cast recovers the intended 6dp decimal "
    "exactly on both engines), so the per-(label, dim) sums are exact "
    "decimal arithmetic — summation ORDER cannot change the result, "
    "which is what makes a distributed partial-agg mean hashable at "
    "all. One partial-agg shuffle keyed (label, dim): dims x labels "
    "output cells regardless of corpus size. The final mean is a "
    "single double division per cell.",
)
def z139184_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        F.posexplode("embedding").alias("pos", "fval"),
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("fval").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("val"),
    )
    return e.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("centroid"),
    )


# --------------------------------------------------------------------------
# Q70 (was Y39) — sequence packing (concat-and-chunk into fixed context windows)
# --------------------------------------------------------------------------
_CTX = 64  # tokens per packed training sequence


@register(
    "z1311770_sequence_pack",
    oracle=f"""
    WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_tok
          FROM d)
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(start_tok // {_CTX} AS BIGINT) AS first_seq,
           CAST((start_tok + n_tokens - 1) // {_CTX} AS BIGINT) AS last_seq,
           CAST((start_tok + n_tokens - 1) // {_CTX}
                - start_tok // {_CTX} + 1 AS INT) AS n_seqs
    FROM c
    """,
    doc="Sequence packing, GPT-style concat-and-chunk: documents are laid "
    "end-to-end in deterministic doc_id order and the token stream is "
    "cut every 64 tokens; each document reports its global token "
    "offset and the [first_seq, last_seq] range of training sequences "
    "it lands in. The global running sum is NOT a bare "
    "Window.orderBy (that is the single-partition trap the WindowExec "
    "warning flags) — it is the distributed two-phase cumsum of "
    "functions/ordering.py: range-shuffle on doc_id, local exclusive "
    "cumsum per partition, #partitions-row offset table broadcast "
    "back. One range shuffle total, so the plan survives a corpus "
    "that is 1000 partitions wide. Token counts sum as longs -> "
    "exact at any scale (packing mandate).",
)
def z1311770_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    c = with_global_cumsum(
        d, [F.col("doc_id")], "n_tokens", cumsum_col="start_tok"
    )
    last_tok = F.col("start_tok") + F.col("n_tokens") - 1
    first_seq = F.floor(F.col("start_tok") / _CTX).cast("long")
    last_seq = F.floor(last_tok / _CTX).cast("long")
    return c.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("start_tok").cast("long").alias("start_tok"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).cast("int").alias("n_seqs"),
    )


# --------------------------------------------------------------------------
# Q71 (was Y40) — unigram log-probability scoring (perplexity-proxy quality filter)
# --------------------------------------------------------------------------
@register(
    "z11771_unigram_logprob",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v),
    s AS (SELECT tok.doc_id,
                 CAST(round(ln(CAST(t.total AS DOUBLE) / v.cnt), 6)
                      AS DECIMAL(18,6)) AS nlp
          FROM tok JOIN v USING (token) CROSS JOIN t)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(nlp) AS DOUBLE) AS sum_neg_logp,
           CAST(FLOOR(CAST(SUM(nlp) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                AS DOUBLE) / 1e6 AS avg_neg_logp
    FROM s GROUP BY doc_id
    """,
    doc="Perplexity-proxy quality scoring: train a corpus unigram LM "
    "(token -> MLE probability) and score every document by its mean "
    "negative log-likelihood — the KenLM-style 'surprising documents "
    "are low quality' filter, done relationally. The vocabulary join "
    "carries NO mandatory broadcast hint: distinct-token cardinality "
    "grows with corpus size (Heaps' law), so at the 100 TB mandate a "
    "forced build-side would OOM the executors — AQE promotes the "
    "join to broadcast whenever the built vocabulary actually fits "
    "(plan-asserted at fixture scale in tests/test_plans.py) and "
    "falls back to sort-merge past the threshold; the corpus total "
    "stays a 1-row broadcast cross join (whitelisted, truly bounded). "
    "Each token's -ln p is rounded to 6dp and summed "
    "as DECIMAL(18,6) -> the per-doc sums are exact and summation-"
    "order independent (the y38 rule), which is what makes a "
    "transcendental aggregate hash-stable across engines.",
)
def z11771_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    v = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = v.agg(F.sum("cnt").cast("long").alias("total"))
    s = (
        tok.join(v, "token")
        .crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            F.round(
                F.log(F.col("total").cast("double") / F.col("cnt")), 6
            )
            .cast("decimal(18,6)")
            .alias("nlp"),
        )
    )
    return s.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("nlp").cast("double").alias("sum_neg_logp"),
        # floor(x*1e6+0.5)/1e6, NOT round(x, 6): the quotient of a 6dp
        # decimal sum by a small integer lands EXACTLY on .5e-6 ties,
        # where Spark and DuckDB round() disagree (half-even vs half-up
        # — hit at sf0.1 by x43's identical shape; floor of identical
        # doubles is identical everywhere).
        (
            F.floor(
                F.sum("nlp").cast("double") / F.count(F.lit(1)) * 1e6 + 0.5
            ).cast("double")
            / 1e6
        ).alias("avg_neg_logp"),
    )


# --------------------------------------------------------------------------
# Q72 (was Y41) — boilerplate line removal (CCNet-style cross-document line dedupe)
# --------------------------------------------------------------------------
_LINE = 10  # tokens per pseudo-line
_LINE_DF = 5  # a line present in >= this many docs is boilerplate


@register(
    "z12772_boilerplate_lines",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    l AS (SELECT doc_id,
                 unnest(range(1, len(tk) + 1, {_LINE})) AS pos,
                 unnest(list_transform(
                   range(1, len(tk) + 1, {_LINE}),
                   i -> array_to_string(tk[i:i+{_LINE - 1}], ' '))) AS line
          FROM d),
    f AS (SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM l GROUP BY line),
    k AS (SELECT l.doc_id, l.pos, l.line
          FROM l JOIN f USING (line) WHERE f.df < {_LINE_DF}),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
                   string_agg(line, ' ' ORDER BY pos) AS cleaned_text
            FROM k GROUP BY doc_id)
    SELECT d.doc_id,
           CAST((len(d.tk) + {_LINE - 1}) // {_LINE} AS INT) AS n_lines,
           COALESCE(agg.n_kept, 0) AS n_kept,
           COALESCE(agg.cleaned_text, '') AS cleaned_text
    FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
    doc="Cross-document boilerplate removal, CCNet-style: split every "
    "document into 10-token pseudo-lines, count each line's document "
    "frequency across the corpus, drop lines that appear in >= 5 "
    "documents (headers, footers, navigation chrome), and re-fold the "
    "survivors IN ORIGINAL ORDER into a cleaned text. Order "
    "preservation is the EPrints multi-value rule (SURVEY §1.1): the "
    "refold sorts struct(pos, line) before joining, never a bare "
    "collect_list. Two content shuffles — the line-frequency partial "
    "agg and the line equi-join back — both keyed on the line string; "
    "the frequency table scales with DISTINCT lines, not documents, "
    "and the join is the same candidate-verify shape as the dedup "
    "family. A doc whose every line is boilerplate survives as an "
    "empty string via the left join (deletion is a row-filter "
    "decision downstream, not silent loss).",
)
def z12772_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", _tokens().alias("tk"))
    starts = F.sequence(F.lit(1), F.size("tk"), F.lit(_LINE))
    lines = F.transform(
        starts, lambda i: F.array_join(F.slice("tk", i, _LINE), " ")
    )
    l = d.select(
        "doc_id",
        F.explode(F.arrays_zip(starts.alias("pos"), lines.alias("line"))).alias(
            "z"
        ),
    ).select("doc_id", F.col("z.pos").alias("pos"), F.col("z.line").alias("line"))
    f = l.groupBy("line").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    k = l.join(f.filter(F.col("df") < _LINE_DF), "line")
    agg = k.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        d.select(
            "doc_id",
            F.floor((F.size("tk") + (_LINE - 1)) / _LINE)
            .cast("int")
            .alias("n_lines"),
        )
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# --------------------------------------------------------------------------
# Y56 — weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------------
_ES_K = 200


@register(
    "z117199_weighted_sample",
    oracle=f"""
    WITH k AS (
        SELECT doc_id, lang, n_chars,
               ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) + 0.5) / 4294967296.0) / n_chars
                 AS es_key
        FROM documents WHERE n_chars >= 1)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM k ORDER BY es_key DESC, doc_id LIMIT {_ES_K}
    """,
    doc="Weighted sampling WITHOUT replacement (k={K}, weight = doc "
    "length): the Efraimidis-Spirakis scheme — each row draws "
    "u~Uniform(0,1) and the k largest u^(1/w) win; implemented as "
    "ln(u)/w (same order, no pow underflow). The uniform comes from "
    "the first 8 md5 hex digits of the doc id, so the 'random' draw "
    "is identical in every engine, rerun, and partitioning — the "
    "md5-as-uniform idea of x24/q77 extended from rate-based "
    "membership to WEIGHTED reservoir selection (training-mix "
    "sampling where long documents should win proportionally). "
    "Distributed shape: pure row-level key computation, then the "
    "q38 TakeOrderedAndProject engine — per-partition top-k, k-row "
    "merge on the driver, no global sort, no shuffle of the corpus. "
    "Measured inter-key margin at the k-boundary: 8.6e-6 (sf0.001), "
    "2.7e-5 (sf0.01) — ~11 orders above double-ulp noise, so the "
    "selected set is stable across engines.".format(K=_ES_K),
)
def z117199_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 1
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    es_key = F.log((u32 + F.lit(0.5)) / F.lit(float(2**32))) / F.col(
        "n_chars"
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            es_key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(_ES_K)
        .drop("es_key")
    )
