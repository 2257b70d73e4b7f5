"""Text-analysis operators for the training-data pipeline (assignment
mandate, extending SURVEY.md §2.11): corpus-trained language ID, quality
scoring, token counting, and winnowing document fingerprints — each an
oracle-paired query over the documents table.

Numeric discipline: every score is built from integer counts (exact) or a
single integer/integer division (IEEE-exact on both engines); fingerprint
hashes are md5 hex strings compared lexicographically — no
engine-specific numerics anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

# corpus words used as the "stopword" list (the fixture vocabulary is
# synthetic; these play the role 'the/of/and' play in natural text)
STOPWORDS = ("data", "table", "row", "value", "key")
PROFILE_TOP_K = 50


# --------------------------------------------------------------------------
# Q63 — language identification (corpus-trained token profiles)
# --------------------------------------------------------------------------
@register(
    "z11663_language_id",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS token
                 FROM documents),
         profile AS (
           SELECT lang, token, cnt FROM (
             SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt,
                    ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY COUNT(*) DESC, token) AS rn
             FROM tok GROUP BY lang, token)
           WHERE rn <= {PROFILE_TOP_K}),
         scores AS (
           SELECT t.doc_id, p.lang AS cand_lang,
                  CAST(SUM(p.cnt) AS BIGINT) AS score
           FROM tok t JOIN profile p ON t.token = p.token
           GROUP BY t.doc_id, p.lang),
         best AS (
           SELECT doc_id, cand_lang AS predicted_lang, score,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand_lang) AS rn
           FROM scores)
    SELECT d.doc_id, d.lang AS actual_lang,
           COALESCE(b.predicted_lang, 'unknown') AS predicted_lang,
           COALESCE(b.score, 0) AS score,
           COALESCE(b.predicted_lang, 'unknown') = d.lang AS is_correct
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
    doc="N-gram(1) language ID: per-language top-50 token profiles are "
    "trained FROM the corpus (one pass), each document scores every "
    "language by summed profile counts of its tokens, argmax wins "
    "(integer scores, lang tie-break -> fully deterministic). The "
    "profile is vocabulary-sized -> broadcast; the only big shuffle is "
    "the (doc, lang) score aggregation. On this synthetic corpus text "
    "does not actually encode lang, so is_correct hovers at chance — "
    "the machinery, not the accuracy, is the operator.",
)
def z11663_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    w_prof = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    profile = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= PROFILE_TOP_K)
        .select(F.col("lang").alias("cand_lang"), "token", "cnt")
    )
    scores = (
        tok.join(F.broadcast(profile), "token")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum("cnt").alias("score"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cand_lang")
    )
    best = (
        scores.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "score")
    )
    return (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "actual_lang",
            F.coalesce("predicted_lang", F.lit("unknown")).alias(
                "predicted_lang"
            ),
            F.coalesce("score", F.lit(0)).alias("score"),
            (
                F.coalesce("predicted_lang", F.lit("unknown"))
                == F.col("actual_lang")
            ).alias("is_correct"),
        )
    )


# --------------------------------------------------------------------------
# Q64 — document quality scoring
# --------------------------------------------------------------------------
@register(
    "z11664_quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             CAST(length(replace(text,' ','')) AS BIGINT) AS n_letters,
             CAST(len(list_filter(string_split(text,' '),
                  t -> t IN {str(tuple(STOPWORDS))})) AS BIGINT) AS n_stop,
             CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                  AS BIGINT) AS n_punct
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(n_letters AS DOUBLE) / n_tokens AS avg_token_len,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CASE WHEN n_tokens BETWEEN 10 AND 1000
                     AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
                THEN 'ok' ELSE 'low' END AS quality_flag
    FROM base
    """,
    doc="Quality scoring for corpus filtering: token count, average token "
    "length, stopword ratio, punctuation ratio, and a keep/drop flag. "
    "All ratios are one integer/integer division (IEEE-exact both "
    "engines). Pure row-level expressions — embarrassingly parallel.",
)
def z11664_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("long")
    n_letters = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "long"
    )
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    n_punct = F.length(
        F.regexp_replace("text", r"[^.,;:!?]", "")
    ).cast("long")
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        (n_letters.cast("double") / n_tokens).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (n_punct.cast("double") / F.col("n_chars")).alias("punct_ratio"),
        F.when(
            n_tokens.between(10, 1000) & (stop_ratio < 0.5), "ok"
        )
        .otherwise("low")
        .alias("quality_flag"),
    )


# --------------------------------------------------------------------------
# Q65 — token counting (whitespace + BPE-ish regex + LLM estimate)
# --------------------------------------------------------------------------
@register(
    "z11665_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                AS BIGINT) AS bpe_tokens,
           CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS est_llm_tokens,
           CAST(n_chars AS DOUBLE) / len(string_split(text,' '))
             AS chars_per_ws_token
    FROM documents
    """,
    doc="Token counting three ways: whitespace split, a BPE-ish regex "
    "(letter runs | digit runs | single symbols — the pre-tokenizer "
    "shape real BPE vocabularies assume), and the chars/4 LLM estimate. "
    "Row-level only.",
)
def z11665_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    ).cast("long")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.ceil(F.col("n_chars").cast("double") / 4).cast("long").alias(
            "est_llm_tokens"
        ),
        (F.col("n_chars").cast("double") / ws).alias("chars_per_ws_token"),
    )


# --------------------------------------------------------------------------
# Q66 — document fingerprinting (winnowing over k-gram hashes)
# --------------------------------------------------------------------------
WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # hashes per winnowing window


@register(
    "z11666_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         kg AS (SELECT doc_id,
                       list_transform(range(1, greatest(len(toks) - {WINNOW_K - 2}, 1)),
                                      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                               toks[i+2])) AS h
                FROM t),
         fp AS (SELECT doc_id, len(h) AS n_kgrams,
                       list_distinct(
                         list_transform(range(1, greatest(len(h) - {WINNOW_W - 2}, 1)),
                                        i -> list_aggregate(
                                               list_slice(h, i, i + {WINNOW_W - 1}),
                                               'min'))) AS fps
                FROM kg)
    SELECT doc_id,
           CAST(n_kgrams AS INT) AS n_kgrams,
           CAST(len(fps) AS INT) AS n_fingerprints,
           list_aggregate(fps, 'min') AS min_fp,
           list_aggregate(fps, 'max') AS max_fp
    FROM fp
    """,
    doc="Winnowing fingerprints (the MOSS scheme): md5 over positional "
    "3-gram token windows, then the lexicographic minimum of every 4 "
    "consecutive hashes; the distinct minima are the document's "
    "fingerprint set (guaranteed shared fingerprints for sufficiently "
    "long shared substrings). Hashes stay hex STRINGS — lexicographic "
    "min is engine-portable where numeric hex parsing is not. Pure "
    "row-level array work; fingerprint sets are the join key for "
    "plagiarism-style matching at scale.",
)
def z11666_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # three bound projections: toks -> kgram hashes -> window minima; each
    # stage's array is referenced multiple times by the next (the
    # inline-split O(len^2) trap — see q_north.doc_shingles)
    with_toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    kgram = lambda i: F.md5(  # noqa: E731
        F.concat_ws(
            " ",
            *[F.element_at(toks, i + F.lit(j + 1)) for j in range(WINNOW_K)],
        )
    )
    with_hashes = with_toks.select(
        "doc_id",
        F.when(
            n >= WINNOW_K,
            F.transform(F.sequence(F.lit(0), n - WINNOW_K), kgram),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("h"),
    )
    h = F.col("h")
    m = F.size(h)
    win_min = lambda i: F.array_min(F.slice(h, i + F.lit(1), WINNOW_W))  # noqa: E731
    with_fps = with_hashes.select(
        "doc_id",
        m.cast("int").alias("n_kgrams"),
        F.array_distinct(
            F.when(
                m >= WINNOW_W,
                F.transform(F.sequence(F.lit(0), m - WINNOW_W), win_min),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("fps"),
    )
    return with_fps.select(
        "doc_id",
        "n_kgrams",
        F.size("fps").cast("int").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


# --------------------------------------------------------------------------
# X18 — PII scrubbing (emails / phone numbers / IPs -> typed placeholders)
# --------------------------------------------------------------------------
# The fixture corpus is synthetic and contains no organic PII, so the
# query first INJECTS deterministic PII derived from doc_id (one email,
# one phone, one IPv4 per row), then scrubs it — the redaction regexes
# and counts are what the oracle verifies. Patterns are written in the
# common subset of Java regex (Spark) and RE2 (DuckDB).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"


@register(
    "z12787_pii_scrub",
    oracle=f"""
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user-' || CAST(doc_id AS VARCHAR) ||
             '@example.com or call 555-' ||
             lpad(CAST((doc_id*7)%10000 AS VARCHAR),4,'0') ||
             ' from 10.' || CAST(doc_id%256 AS VARCHAR) || '.0.' ||
             CAST((doc_id*3)%256 AS VARCHAR) AS t
      FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t,'{_PII_EMAIL}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(t,'{_PII_PHONE}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(t,'{_PII_IP}')) AS BIGINT) AS n_ips,
      regexp_replace(regexp_replace(regexp_replace(t,
        '{_PII_EMAIL}','<EMAIL>','g'),
        '{_PII_IP}','<IP>','g'),
        '{_PII_PHONE}','<PHONE>','g') AS scrubbed
    FROM pii
    """,
    doc="PII scrubbing for training-data hygiene: redact emails, phone "
    "numbers, and IPv4 addresses to typed placeholders and count each "
    "family. Pure row-level regexp_replace/regexp_count — "
    "embarrassingly parallel, no shuffle at any scale. Scrub order "
    "(email, ip, phone) is fixed so the families cannot capture each "
    "other's remnants (LLM-pipeline mandate).",
)
def z12787_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user-"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 3) % 256).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IP),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(_PII_IP)).cast("long").alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


# --------------------------------------------------------------------------
# X19 — repetition filter (Gopher-style within-document repetition signals)
# --------------------------------------------------------------------------
@register(
    "z12788_repetition_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
    m AS (SELECT doc_id,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(list_max(list_transform(list_distinct(toks),
           w -> len(list_filter(toks, x -> x = w)))) AS BIGINT) AS max_word_c,
      CAST(len(toks) - 1 AS BIGINT) AS total_2g,
      CAST(len(list_distinct(list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS distinct_2g
    FROM t)
    SELECT doc_id, n_tokens,
      CAST(max_word_c AS DOUBLE)/n_tokens AS top_word_frac,
      CAST(total_2g - distinct_2g AS DOUBLE)/greatest(total_2g,1)
        AS dup_2gram_frac,
      CASE WHEN CAST(max_word_c AS DOUBLE)/n_tokens > 0.12
                OR CAST(total_2g - distinct_2g AS DOUBLE)
                   /greatest(total_2g,1) > 0.08
           THEN 'drop' ELSE 'keep' END AS rep_flag
    FROM m
    """,
    doc="Within-document repetition signals (the Gopher/MassiveText "
    "quality-rule family, public literature): most-frequent-word "
    "fraction and duplicate-2gram fraction, with a keep/drop flag. "
    "Everything is doc-local array HOFs — zero shuffles at any scale; "
    "the per-row cost is O(distinct_words * tokens), bounded by "
    "document length. Ratios are one integer/integer division "
    "(IEEE-exact both engines). For corpora with per-doc vocabularies "
    "large enough to make the quadratic HOF hurt, the explode + "
    "two-level groupBy form trades it for one shuffle keyed on doc_id.",
)
def z12788_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # two-step select: toks referenced many times below — inlining the
    # split would re-split per reference (same trap as doc_shingles)
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    max_word_c = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    ).cast("long")
    bigrams = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    m = t.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        max_word_c.alias("max_word_c"),
        (n - 1).cast("long").alias("total_2g"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("distinct_2g"),
    )
    top_word_frac = F.col("max_word_c").cast("double") / F.col("n_tokens")
    dup_2gram_frac = (F.col("total_2g") - F.col("distinct_2g")).cast(
        "double"
    ) / F.greatest(F.col("total_2g"), F.lit(1))
    return m.select(
        "doc_id",
        "n_tokens",
        top_word_frac.alias("top_word_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        F.when((top_word_frac > 0.12) | (dup_2gram_frac > 0.08), "drop")
        .otherwise("keep")
        .alias("rep_flag"),
    )


# --------------------------------------------------------------------------
# X24 — deterministic corpus split + reproducible sampling
# --------------------------------------------------------------------------
# Split/sample membership must be a pure function of the stable row id so
# any engine, any partitioning, and any rerun produce the same corpus:
# md5(id) is uniform, and comparing its first hex bytes against fixed
# thresholds gives rates in multiples of 1/256 with plain string
# comparison semantics identical across engines (no hex parsing, no
# engine-specific hash).
_TRAIN_LT = "e6"  # 230/256 ~ 89.8%
_VAL_LT = "f3"    # +13/256 ~  5.1%; remainder test ~ 5.1%
_SAMPLE_LT = "1a"  # 26/256 ~ 10.2%


@register(
    "z12793_deterministic_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hs,
             substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS hx
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN hs < '{_TRAIN_LT}' THEN 'train'
                WHEN hs < '{_VAL_LT}' THEN 'val'
                ELSE 'test' END AS split,
           CAST(CASE WHEN hx < '{_SAMPLE_LT}' THEN 1 ELSE 0 END AS INT)
             AS in_10pct_sample
    FROM h
    """,
    doc="Deterministic train/val/test assignment (~90/5/5) and a "
    "reproducible ~10% sample flag, both pure functions of doc_id via "
    "md5 prefix ranges — identical membership on any engine, any "
    "partitioning, any rerun (the property TABLESAMPLE/rand() cannot "
    "give). Row-level, zero shuffle; the salt prefix decorrelates the "
    "sample from the split (training-data pipeline mandate).",
)
def z12793_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hs = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    hx = F.substring(
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(hs < _TRAIN_LT, "train")
        .when(hs < _VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
        F.when(hx < _SAMPLE_LT, 1).otherwise(0).cast("int").alias("in_10pct_sample"),
    )


# --------------------------------------------------------------------------
# Y54 — text normalization (control-char strip + whitespace canon)
# --------------------------------------------------------------------------
# Explicit byte-range classes so the Java (Spark) and RE2 (DuckDB) regex
# engines agree: no \s, no POSIX classes, no unicode properties.
_CTRL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RUN = r"[ \t\r\n]+"


@register(
    "z117197_text_normalize",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, lang, text,
               trim(regexp_replace(
                    regexp_replace(text, '{_CTRL_CLASS}', '', 'g'),
                    '{_WS_RUN}', ' ', 'g')) AS clean
        FROM documents)
    SELECT doc_id, lang,
           md5(clean) AS clean_md5,
           CAST(length(text) AS BIGINT) AS len_raw,
           CAST(length(clean) AS BIGINT) AS len_clean,
           CAST(length(text) - length(clean) AS BIGINT) AS n_removed
    FROM c
    """,
    doc="Corpus text normalization (the first stage of every LLM "
    "cleaning pipeline): strip control characters, collapse "
    "whitespace runs to single spaces, trim. Pure row-level map — "
    "zero shuffles, pushes into the scan projection. The cleaned "
    "text is hashed (md5) rather than emitted so the oracle "
    "comparison stays value-exact without shipping megabytes through "
    "the hasher; the regexes use explicit byte-range classes only, "
    "the portable intersection of Java regex and RE2 (no \\s / POSIX "
    "/ unicode classes, which differ between engines) "
    "(text-cleaning mandate; x18/x19's upstream stage).",
)
def z117197_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _CTRL_CLASS, ""),
            _WS_RUN,
            " ",
        )
    )
    return docs.select(
        "doc_id",
        "lang",
        F.md5(clean).alias("clean_md5"),
        F.length("text").cast("long").alias("len_raw"),
        F.length(clean).cast("long").alias("len_clean"),
        (F.length("text") - F.length(clean)).cast("long").alias("n_removed"),
    )
