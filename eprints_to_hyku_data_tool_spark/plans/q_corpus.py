"""Corpus-preparation macro-operators (round-3 breadth batch 2): the
remaining steps a training-data pipeline runs between raw documents and
a training mix — benchmark decontamination, chunking, per-stratum
sampling, BM25 relevance, and a vocabulary/Zipf profile.

All five are oracle-paired. Their y-tier registry names sort OUTSIDE
the driver's 50-entry verification window (which is full); they are
verified by the local sf0.01 parity mirror on every pytest run, like the
z tier.

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
# Y31 — benchmark decontamination (8-gram overlap vs a held-out eval set)
# --------------------------------------------------------------------------
@register(
    "y31_decontaminate",
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
    "than the per-doc hit count. Unmatched and sub-8-token docs are "
    "kept via the left join-back (n_hits=0). At 100 TB the broadcast "
    "is O(eval suite), constant in corpus size (decontamination "
    "mandate).",
)
def y31_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", _grams8(_tokens()).alias("grams"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    ev = (
        g.filter(is_eval)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    base = g.filter(~is_eval).select(
        "doc_id", F.size("grams").alias("n_grams"), "grams"
    )
    hits = (
        base.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.drop("grams")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.greatest("n_grams", F.lit(1))
            ).alias("contamination"),
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Y32 — token-window chunking (overlapping training chunks)
# --------------------------------------------------------------------------
@register(
    "y32_chunk",
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
def y32_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "y33_stratified_sample",
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
def y33_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "y34_bm25",
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
def y34_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "y35_vocab_zipf",
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
def y35_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
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
