"""UDF / UDAF / UDTF surface: SURVEY.md §2.10 Q57-Q58, X12-X14.

The reference repo has no code (SURVEY.md §0); this is the extension
surface: vectorized scalar pandas UDFs, grouped-map (applyInPandas),
grouped-agg pandas UDAFs, mapInPandas one-to-many expansion, and
SQL-registered UDFs.

Every UDF here is Arrow-batched (pandas_udf / mapInPandas /
applyInPandas) — NEVER row-at-a-time python UDFs, which serialize
per-row and are 10-100x slower. Each oracle re-expresses the same
formula in SQL, so the python path is value-checked, not just smoke-run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


# NOTE: pandas_udf objects are created INSIDE the query functions — the
# decorator requires an active SparkSession, and plan modules must be
# importable without one (registry._load_all runs at import time).


# --------------------------------------------------------------------------
# Q57 — scalar pandas UDF (vectorized text metric)
# --------------------------------------------------------------------------
@register(
    "z11657_scalar_pandas_udf",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS ttr
    FROM documents
    """,
    doc="Vectorized scalar pandas UDF: type-token ratio per document. "
    "Integer-count division is IEEE-exact, so the python result is "
    "bit-identical to the SQL re-expression — no rounding needed "
    "(SURVEY §2.10 Q57).",
)
def z11657_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def type_token_ratio(text: pd.Series) -> pd.Series:
        # Distinct words / total words, one Arrow batch at a time.
        toks = text.str.split(" ")
        return toks.map(lambda t: len(set(t)) / len(t) if t else 0.0)

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", type_token_ratio("text").alias("ttr"))


# --------------------------------------------------------------------------
# Q58 — grouped-map UDF (applyInPandas)
# --------------------------------------------------------------------------
@register(
    "z11658_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z_chars
    FROM documents
    """,
    doc="Grouped-map applyInPandas: per-language z-score of document "
    "length — each group arrives as one pandas frame. Rounded 6dp on "
    "both sides (pandas pairwise summation vs SQL streaming moments "
    "differ in the last ulps). At scale groups must fit in one "
    "executor's memory; that contract is ENFORCED, not assumed — the "
    "UDF raises once a group exceeds MAX_GROUP_ROWS instead of OOMing "
    "an executor (SURVEY §2.10 Q58; r2 verdict item 10).",
)
def z11658_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    # ~10M rows x 3 narrow columns ~= hundreds of MB as pandas — the order
    # of magnitude where one group stops fitting an executor comfortably.
    MAX_GROUP_ROWS = 10_000_000

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > MAX_GROUP_ROWS:
            raise ValueError(
                f"q58 group '{pdf['lang'].iat[0]}' has {len(pdf)} rows "
                f"(> {MAX_GROUP_ROWS}): a grouped-map pandas UDF "
                "materializes the whole group — re-key the grouping or "
                "use the windowed SQL form instead"
            )
        x = pdf["n_chars"].astype("float64")
        pdf = pdf.assign(z_chars=((x - x.mean()) / x.std(ddof=1)).round(6))
        return pdf[["doc_id", "lang", "z_chars"]]

    return docs.groupBy("lang").applyInPandas(
        zscore, "doc_id bigint, lang string, z_chars double"
    )


# --------------------------------------------------------------------------
# X12 — grouped-agg pandas UDAF
# --------------------------------------------------------------------------
@register(
    "z12781_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS weighted_price,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Grouped-agg pandas UDAF: quantity-weighted mean price per return "
    "flag, used directly inside groupBy().agg() alongside built-ins. "
    "Rounded 4dp (summation-order noise) (SURVEY §2.10 X12).",
)
def z12781_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
        # Quantity-weighted mean price over one group (Arrow-batched).
        return float((price * qty).sum() / qty.sum())

    @F.pandas_udf("long")
    def pandas_count(qty: pd.Series) -> int:
        # Spark forbids mixing grouped-agg pandas UDFs with JVM aggregates
        # in one agg() — the count is a pandas UDAF too.
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_mean_price("l_extendedprice", "l_quantity"), 4
        ).alias("weighted_price"),
        pandas_count("l_quantity").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# X13 — UDTF / mapInPandas one-to-many expansion (record shredding)
# --------------------------------------------------------------------------
@register(
    "z12782_mapinpandas_shred",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 40
    """,
    doc="mapInPandas as a UDTF: each document row expands to one row per "
    "token with its 1-based position — the EPrints-XML-shredding shape "
    "(one parent record -> many child rows), batch-at-a-time with no "
    "JVM round trip per row (SURVEY §2.10 X13).",
)
def z12782_mapinpandas_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)

    def shred(batches):
        for pdf in batches:
            out = {"doc_id": [], "pos": [], "token": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, tok in enumerate(text.split(" "), start=1):
                    out["doc_id"].append(doc_id)
                    out["pos"].append(i)
                    out["token"].append(tok)
            yield pd.DataFrame(out).astype({"doc_id": "int64", "pos": "int32"})

    return docs.select("doc_id", "text").mapInPandas(
        shred, "doc_id bigint, pos int, token string"
    )


# --------------------------------------------------------------------------
# X14 — SQL-registered UDF (reachable from spark.sql)
# --------------------------------------------------------------------------
@register(
    "z12783_sql_registered_udf",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
    FROM documents
    """,
    doc="UDF registered into the SQL function catalog (an Arrow-batched "
    "pandas UDF, not a row-at-a-time one) and invoked from a spark.sql "
    "string over a temp view — SURVEY §3 entry point 2 "
    "(SURVEY §2.10 X14).",
)
def z12783_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def word_count(text: pd.Series) -> pd.Series:
        return text.str.split(" ").map(len)

    spark.udf.register("word_count", word_count)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "x14_documents_v"
    )
    return spark.sql(
        "SELECT doc_id, word_count(text) AS n_words FROM x14_documents_v"
    )


# --------------------------------------------------------------------------
# X22 — real Python UDTF (table function): one input row -> N output rows
# via the @udtf class API, consumed with a SQL LATERAL join
# --------------------------------------------------------------------------
@register(
    "z12791_udtf_ngrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
    SELECT doc_id, CAST(x.i AS INT) AS pos,
           toks[CAST(x.i AS INT)+1] || ' ' || toks[CAST(x.i AS INT)+2] AS ngram
    FROM t, LATERAL (SELECT unnest(range(0, len(toks)-1)) AS i) x
    """,
    doc="Bigram shredding as a REAL Python UDTF (the @udtf class API, "
    "distinct from x13's mapInPandas shredding): eval() yields (pos, "
    "bigram) rows, the query consumes it with SQL LATERAL. useArrow=True "
    "keeps the exchange Arrow-batched (plan shows ArrowEvalPythonUDTF, "
    "not the row-serialized BatchEvalPythonUDTF the fleet lint bans). "
    "Row-multiplying but shuffle-free: the UDTF runs where the data "
    "lives (SURVEY §2.10 extension).",
)
def z12791_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("x22_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("x22_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.ngram FROM x22_docs, LATERAL x22_bigrams(text) t"
    )
