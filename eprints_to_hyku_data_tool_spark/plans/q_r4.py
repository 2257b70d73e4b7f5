"""Round-4 breadth batch: training-corpus and robust-analytics operators
filling the freed driver-window slots (x43+). Every query is
oracle-paired and follows the established cross-engine disciplines:

- transcendentals (ln) are rounded to 6dp per row and summed as
  DECIMAL(18,6) (the q71 rule) so aggregates are exact and
  summation-order independent;
- everything else summed is INTEGER by construction (micro-unit
  quantization where inputs are floats), with wide products summed as
  DECIMAL(38,0) / HUGEINT so no engine overflows;
- float outputs are single IEEE divisions (or sqrt) of exactly-computed
  integers — bit-identical cross-engine with no rounding step;
- medians are the LOWER-median (row_number == (n+1)/2), never an
  interpolation, so engine interpolation formulas can't diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from ..functions.checkpointing import materialize
from .registry import register

# --------------------------------------------------------------------------
# X43 — bigram language-model scoring (add-one smoothing)
# --------------------------------------------------------------------------


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) bigram stream built ARRAY-SIDE: zip the token
    array with its own tail and explode the pair structs. Zero shuffle —
    a lag-window form would sort the whole corpus by doc_id first, a
    100 TB exchange this formulation never pays. The split is bound in
    its own projection so it evaluates once, not once per slice."""
    d = docs.select("doc_id", F.split("text", " ").alias("tk"))
    tk = F.col("tk")
    tail_len = F.greatest(F.size(tk) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(tk, F.lit(1), tail_len).alias("w1"),
        F.slice(tk, F.lit(2), tail_len).alias("w2"),
    )
    return d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


@register(
    "z128243_bigram_lm",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    b AS (SELECT doc_id,
                 unnest(list_slice(tk, 1, len(tk) - 1)) AS w1,
                 unnest(list_slice(tk, 2, len(tk))) AS w2
          FROM t WHERE len(tk) >= 2),
    cxy AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_xy
            FROM b GROUP BY w1, w2),
    cx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt_x
           FROM b GROUP BY w1),
    v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vsz
          FROM (SELECT unnest(tk) AS token FROM t)),
    s AS (SELECT b.doc_id,
                 CAST(round(ln(CAST(cx.cnt_x + v.vsz AS DOUBLE)
                               / (cxy.cnt_xy + 1)), 6)
                      AS DECIMAL(18,6)) AS nlp
          FROM b JOIN cxy USING (w1, w2) JOIN cx USING (w1) CROSS JOIN v)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nlp) AS DOUBLE) AS sum_neg_logp,
           CAST(FLOOR(CAST(SUM(nlp) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                AS DOUBLE) / 1e6 AS avg_neg_logp
    FROM s GROUP BY doc_id
    """,
    doc="Bigram language-model scoring with add-one smoothing — the "
    "KenLM-style perplexity filter one order up from q71's unigram LM: "
    "p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V), documents scored by mean "
    "negative log-likelihood over their bigrams. Counts tables are "
    "vocabulary- and bigram-vocabulary-sized and join back onto the "
    "bigram stream WITHOUT broadcast hints (a 100 TB bigram table "
    "does not fit a broadcast; AQE promotes when it does fit). Each "
    "-ln p is rounded to 6dp and summed as DECIMAL(18,6) — the q71 "
    "rule that makes a transcendental aggregate hash-stable. Shuffles: "
    "two count aggs, two token-keyed joins, final doc-keyed agg — the "
    "bigram stream itself is built ARRAY-SIDE (zip of the token array "
    "with its own tail, then explode), so unlike a lag-window form no "
    "corpus-wide doc_id shuffle + sort ever happens (LM-filter "
    "mandate).",
)
def z128243_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    big = _bigrams(docs).select("doc_id", "w1", "w2")
    cxy = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_xy")
    )
    cx = big.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cnt_x"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    v = tok.agg(F.count_distinct("token").cast("long").alias("vsz"))
    s = (
        big.join(cxy, ["w1", "w2"])
        .join(cx, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("cnt_x") + F.col("vsz")).cast("double")
                    / (F.col("cnt_xy") + 1)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nlp"),
        )
    )
    return s.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nlp").cast("double").alias("sum_neg_logp"),
        # floor idiom, not round(): the 6dp-decimal-sum / small-int
        # quotient lands exactly on .5e-6 rounding ties where the
        # engines' round() semantics differ (caught at sf0.1 — two docs
        # with sum/n = ...5 exactly; sf0.01 passed by data luck).
        (
            F.floor(
                F.sum("nlp").cast("double") / F.count(F.lit(1)) * 1e6 + 0.5
            ).cast("double")
            / 1e6
        ).alias("avg_neg_logp"),
    )


# --------------------------------------------------------------------------
# X44 — PMI collocation mining (top-20 by lift, exact rational ordering)
# --------------------------------------------------------------------------
_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@register(
    "z128244_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    b AS (SELECT unnest(list_slice(tk, 1, len(tk) - 1)) AS w1,
                 unnest(list_slice(tk, 2, len(tk))) AS w2
          FROM t WHERE len(tk) >= 2),
    cxy AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_xy
            FROM b GROUP BY w1, w2),
    cx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt_x FROM b GROUP BY w1),
    cy AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cnt_y FROM b GROUP BY w2),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM b),
    l AS (SELECT cxy.w1, cxy.w2, cxy.cnt_xy,
                 CAST(cxy.cnt_xy * n.total AS DOUBLE)
                 / CAST(cx.cnt_x * cy.cnt_y AS DOUBLE) AS lift
          FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
          WHERE cxy.cnt_xy >= {_PMI_MIN_COUNT})
    SELECT w1, w2, cnt_xy, lift
    FROM l ORDER BY lift DESC, w1, w2 LIMIT {_PMI_TOP}
    """,
    doc="Collocation mining: top-20 bigrams by pointwise-mutual-"
    "information lift = N*c(w1,w2) / (c(w1·)*c(·w2)) with a min-count "
    "support filter — the standard phrase-detection pass (word2vec "
    "phrases, spaCy collocations) done relationally. The lift is ONE "
    "double division of two exactly-representable integer products "
    "(< 2^53 by construction at any SF where counts fit BIGINT), so "
    "ordering and values are bit-identical cross-engine without "
    "rounding, and monotone with log-PMI so no transcendental is "
    "needed at all; ties break on the words. Shuffles: three count "
    "aggs + two joins keyed on words, then a global top-20 "
    "(TakeOrdered — no full sort); the bigram stream is array-side "
    "zero-shuffle (x43's _bigrams). No broadcast hints: count tables "
    "are vocabulary-sized (collocation mandate).",
)
def z128244_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    big = _bigrams(docs).select("w1", "w2")
    cxy = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_xy")
    )
    cx = big.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cnt_x"))
    cy = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("cnt_y"))
    n = big.agg(F.count(F.lit(1)).cast("long").alias("total"))
    lifted = (
        cxy.filter(F.col("cnt_xy") >= _PMI_MIN_COUNT)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "cnt_xy",
            (
                (F.col("cnt_xy") * F.col("total")).cast("double")
                / (F.col("cnt_x") * F.col("cnt_y")).cast("double")
            ).alias("lift"),
        )
    )
    return lifted.orderBy(F.desc("lift"), "w1", "w2").limit(_PMI_TOP)


# --------------------------------------------------------------------------
# X45 — markup strip (tag removal + entity decode + whitespace normalize)
# --------------------------------------------------------------------------
@register(
    "z128245_html_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id, text,
             '<div class="doc"><p>'
               || replace(text, ' ', '&nbsp;</p><p>') || '</p></div>'
               AS html
      FROM documents),
    c AS (
      SELECT doc_id, text,
             trim(regexp_replace(
               replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                       '&nbsp;', ' '),
               ' +', ' ', 'g')) AS clean
      FROM h)
    SELECT doc_id,
           md5(clean) AS clean_md5,
           CAST(length(clean) AS BIGINT) AS clean_len,
           clean = trim(regexp_replace(text, ' +', ' ', 'g'))
             AS roundtrip_ok
    FROM c
    """,
    doc="Markup removal for corpus ingestion: documents are wrapped in "
    "deterministic HTML (tags + &nbsp; entities), then the strip kit "
    "runs tag removal -> entity decode -> whitespace collapse -> trim, "
    "all expression-level regexp_replace (zero shuffle, full codegen). "
    "The roundtrip_ok verdict proves strip(wrap(text)) == "
    "normalize(text) — the oracle recomputes both sides so the check "
    "is real on every row. The regexes ('<[^>]+>', ' +') sit in the "
    "Java-regex/RE2 common subset, which is exactly the portable "
    "subset a cross-engine pipeline must stay in (HTML-corpus "
    "mandate).",
)
def z128245_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="doc"><p>'),
        F.regexp_replace("text", " ", "&nbsp;</p><p>"),
        F.lit("</p></div>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(html, "<[^>]+>", " "), "&nbsp;", " "
            ),
            " +",
            " ",
        )
    )
    norm = F.trim(F.regexp_replace(F.col("text"), " +", " "))
    return docs.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("long").alias("clean_len"),
        (clean == norm).alias("roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# X46 — incremental ingestion dedupe (new batch vs seen-hash set)
# --------------------------------------------------------------------------
@register(
    "z128246_incremental_dedupe",
    oracle="""
    WITH seen AS (SELECT DISTINCT md5(text) AS ch FROM documents
                  WHERE doc_id % 10 >= 2),
    inc AS (SELECT doc_id, md5(text) AS content_md5 FROM documents
            WHERE doc_id % 10 < 2)
    SELECT inc.doc_id, inc.content_md5,
           seen.ch IS NULL AS is_new
    FROM inc LEFT JOIN seen ON inc.content_md5 = seen.ch
    """,
    doc="Incremental ingestion dedupe — the daily-crawl primitive: an "
    "incoming batch (20% of docs by id range, standing in for today's "
    "crawl) is marked against the seen-content hash set (the other "
    "80%) with a hash-keyed left join; is_new = no prior copy exists. "
    "At 100 TB the seen set is a bucketed hash table on stable "
    "storage and the join is co-located by bucket — the query shape "
    "(distinct + hash equi-join, no arrays shuffled) is exactly that; "
    "AQE broadcasts the day's batch when it is the small side "
    "(incremental-pipeline mandate).",
)
def z128246_incremental_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seen = (
        docs.filter(F.col("doc_id") % 10 >= 2)
        .select(F.md5("text").alias("ch"))
        .distinct()
    )
    inc = docs.filter(F.col("doc_id") % 10 < 2).select(
        "doc_id", F.md5("text").alias("content_md5")
    )
    return inc.join(
        seen, inc.content_md5 == seen.ch, "left"
    ).select("doc_id", "content_md5", F.col("ch").isNull().alias("is_new"))


# --------------------------------------------------------------------------
# X47 — robust outlier stats (lower-median + MAD, exact)
# --------------------------------------------------------------------------
@register(
    "z128247_mad_outliers",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (SELECT event_type, value AS med FROM r WHERE rn = (n + 1) // 2),
    d AS (SELECT e.event_type, e.event_id, m.med,
                 abs(e.value - m.med) AS ad
          FROM events e JOIN med m USING (event_type)),
    r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                        ORDER BY ad, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM d),
    mad AS (SELECT event_type, ad AS mad FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type,
           ANY_VALUE(d.med) AS med,
           ANY_VALUE(mad.mad) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust per-group outlier statistics: median + MAD (median "
    "absolute deviation) of events.value per event_type, and the "
    "count of |x - med| > 3*MAD outliers — the robust z-score filter "
    "that survives the heavy tails a mean/stddev filter (q87) does "
    "not. Both medians are the LOWER median (row_number == (n+1)/2 "
    "under a value,event_id total order) — a selected INPUT value, "
    "never an interpolation, so engine interpolation formulas cannot "
    "diverge and every downstream double (ad, 3*mad, the comparison) "
    "is bit-identical. Cost is two per-group sorts (the exact-median "
    "price); at 100 TB swap in approx_percentile(0.5) which needs no "
    "sort — the query shape (window + join back) is unchanged "
    "(robust-stats mandate).",
)
def z128247_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = r.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select("event_type", F.col("value").alias("med"))
    d = ev.join(med, "event_type").select(
        "event_type",
        "event_id",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    w2 = Window.partitionBy("event_type").orderBy("ad", "event_id")
    r2 = d.select(
        "event_type",
        "ad",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = r2.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select("event_type", F.col("ad").alias("mad"))
    return (
        d.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# X48 — percentile-rank feature normalization
# --------------------------------------------------------------------------
@register(
    "z128248_percentile_norm",
    oracle="""
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value)
             AS pct_rank,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value)
             AS cume
    FROM events
    """,
    doc="Percentile-rank normalization per group — the rank-based "
    "feature transform (quantile normalization's streaming-friendly "
    "half): percent_rank = (rank-1)/(n-1) and cume_dist per "
    "event_type over value. Both are divisions of exact integers "
    "(rank counts), so tied values share identical doubles on both "
    "engines with no rounding step. One shuffle: both window "
    "functions share the event_type partitioning; at 100 TB this is "
    "a single range-partitioned sort per group key "
    "(normalization mandate).",
)
def z128248_percentile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# X49 — cross-source vocabulary overlap (pairwise Jaccard)
# --------------------------------------------------------------------------
@register(
    "z128249_vocab_overlap",
    oracle="""
    WITH tok AS (SELECT DISTINCT source, token FROM
                   (SELECT source, unnest(string_split(text, ' ')) AS token
                    FROM documents)),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
           FROM tok GROUP BY source),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                     a.n AS n_a, b.n AS n_b
              FROM sz a JOIN sz b ON a.source < b.source),
    inter AS (SELECT a.source AS src_a, b.source AS src_b,
                     CAST(COUNT(*) AS BIGINT) AS inter
              FROM tok a JOIN tok b
                ON a.token = b.token AND a.source < b.source
              GROUP BY 1, 2)
    SELECT p.src_a, p.src_b,
           COALESCE(i.inter, 0) AS inter,
           p.n_a + p.n_b - COALESCE(i.inter, 0) AS uni,
           CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / (p.n_a + p.n_b - COALESCE(i.inter, 0)) AS jaccard
    FROM pairs p LEFT JOIN inter i USING (src_a, src_b)
    """,
    doc="Cross-source vocabulary overlap: distinct (source, token) "
    "sets, pairwise intersection via a token-keyed self-join, Jaccard "
    "= inter/union as one division of exact integers — the "
    "data-mixing diagnostic that tells you whether two corpus sources "
    "are near-duplicates at the vocabulary level before you pay for "
    "document-level dedup between them. Pairs materialize from the "
    "tiny per-source size table (sources^2 rows), so zero-overlap "
    "pairs still appear. Shuffles: distinct, size agg, one "
    "token-keyed join + pair agg — all safe at 100 TB where 'source' "
    "is a crawl/domain column (mixing mandate).",
)
def z128249_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .distinct()
    )
    sz = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = sz.alias("a"), sz.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (
        ta.join(
            tb,
            (F.col("ta.token") == F.col("tb.token"))
            & (F.col("ta.source") < F.col("tb.source")),
        )
        .groupBy(
            F.col("ta.source").alias("src_a"),
            F.col("tb.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    j = pairs.join(inter, ["src_a", "src_b"], "left")
    inter_c = F.coalesce("inter", F.lit(0))
    uni = F.col("n_a") + F.col("n_b") - inter_c
    return j.select(
        "src_a",
        "src_b",
        inter_c.alias("inter"),
        uni.alias("uni"),
        (inter_c.cast("double") / uni).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# X50 — Pearson correlation matrix (exact integer moments)
# --------------------------------------------------------------------------
_CORR_VARS = {
    # column -> micro-unit scale chosen so values stay integral and
    # per-row products fit BIGINT at any realistic SF
    "quantity": ("l_quantity", 1_000),
    "price": ("l_extendedprice", 100),
    "discount": ("l_discount", 1_000_000),
    "tax": ("l_tax", 1_000_000),
}


def _corr_pairs():
    ks = list(_CORR_VARS)
    return [(ks[i], ks[j]) for i in range(len(ks)) for j in range(i + 1, len(ks))]


@register(
    "z128250_corr_matrix",
    oracle=f"""
    WITH q AS (SELECT
        {", ".join(
            f"CAST(floor(CAST({col} AS DOUBLE) * {sc} + 0.5) AS BIGINT)"
            f" AS {k}" for k, (col, sc) in _CORR_VARS.items()
        )}
      FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        {", ".join(
            f"CAST(SUM(CAST({k} AS HUGEINT)) AS HUGEINT) AS s_{k}"
            for k in _CORR_VARS
        )},
        {", ".join(
            f"CAST(SUM(CAST({a} * {b} AS HUGEINT)) AS HUGEINT) AS s_{a}_{b}"
            for a, b in _corr_pairs()
        )},
        {", ".join(
            f"CAST(SUM(CAST({k} * {k} AS HUGEINT)) AS HUGEINT) AS s2_{k}"
            for k in _CORR_VARS
        )}
      FROM q)
    {" UNION ALL ".join(
        f"SELECT '{a}~{b}' AS pair, "
        f"CAST(n * s_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
        f" / (sqrt(CAST(n * s2_{a} - s_{a} * s_{a} AS DOUBLE))"
        f"    * sqrt(CAST(n * s2_{b} - s_{b} * s_{b} AS DOUBLE))) AS corr"
        f" FROM m" for a, b in _corr_pairs()
    )}
    """,
    doc="Pearson correlation matrix over the lineitem numeric columns "
    "with EXACT integer moments: each column quantizes to micro-units "
    "(its native decimal scale, so quantization is lossless), the six "
    "(sum, sum-of-squares, cross-product) moments accumulate as "
    "DECIMAL(38,0)/HUGEINT — exact and summation-order independent — "
    "and r = (n*Sxy - Sx*Sy) / sqrt(...)sqrt(...) is evaluated in "
    "double only at the last step, so both engines emit bit-identical "
    "correlations with no tolerance band (the y38/y63 exact-moment "
    "rule applied to corr, where naive float covariance would be "
    "partition-order dependent). ONE scan, one partial-agg shuffle of "
    "a single 15-cell row; the 6-row matrix is driver-side trivial "
    "(profiling mandate; the built-in corr() is float-path and "
    "engine-divergent, which is exactly why this query exists).",
)
def z128250_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.floor(F.col(col).cast("double") * sc + 0.5)
            .cast("long")
            .alias(k)
            for k, (col, sc) in _CORR_VARS.items()
        ]
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    aggs += [
        F.sum(F.col(k).cast(dec)).cast(dec).alias(f"s_{k}")
        for k in _CORR_VARS
    ]
    aggs += [
        F.sum((F.col(a) * F.col(b)).cast(dec)).cast(dec).alias(f"s_{a}_{b}")
        for a, b in _corr_pairs()
    ]
    aggs += [
        F.sum((F.col(k) * F.col(k)).cast(dec)).cast(dec).alias(f"s2_{k}")
        for k in _CORR_VARS
    ]
    m = q.agg(*aggs)
    # Unpivot the 1-row moment table with ONE explode-of-structs
    # projection, not a 6-way unionAll of per-pair selects: each union
    # branch embedded the full scan+agg subtree, so the static plan
    # carried SIX lineitem scans and six agg pipelines (the r15
    # before-plan; runtime exchange reuse collapsed most of the data
    # work but still planned/scheduled six final-agg branches). The
    # explode form matches the docstring's "one scan, one shuffle"
    # claim in the plan itself and emits the same 6 (pair, corr) rows.
    pair_structs = []
    for a, b in _corr_pairs():
        num = (F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast("double")
        va = (F.col("n") * F.col(f"s2_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast("double")
        vb = (F.col("n") * F.col(f"s2_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast("double")
        pair_structs.append(
            F.struct(
                F.lit(f"{a}~{b}").alias("pair"),
                (num / (F.sqrt(va) * F.sqrt(vb))).alias("corr"),
            )
        )
    return m.select(
        F.explode(F.array(*pair_structs)).alias("x")
    ).select("x.pair", "x.corr")


# --------------------------------------------------------------------------
# X51 — duplicate-cluster size histogram
# --------------------------------------------------------------------------
@register(
    "z128251_dup_cluster_sizes",
    oracle="""
    WITH c AS (SELECT md5(text) AS ch, CAST(COUNT(*) AS BIGINT) AS sz
               FROM documents GROUP BY md5(text))
    SELECT CAST(sz AS INT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_docs
    FROM c GROUP BY sz
    """,
    doc="Exact-duplicate cluster-size histogram: group documents by "
    "content hash, then histogram the cluster sizes — the first "
    "diagnostic run on any new corpus (how much exact duplication, "
    "and is it pairs or giant clusters, which decides whether "
    "keep-first dedupe or cluster-level dedupe is needed). Two "
    "partial-agg shuffles, the second over at most max-cluster-size "
    "keys; never materializes per-cluster member lists "
    "(dedup-diagnostics mandate).",
)
def z128251_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy(F.md5("text").alias("ch")).agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return c.groupBy(F.col("sz").cast("int").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# X52 — containment near-dup (winnowing candidates + w.h.p.-exact verify)
# --------------------------------------------------------------------------
@register(
    "z10658_winnow_containment",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    kg AS (SELECT doc_id,
                  list_transform(range(1, greatest(len(toks) - 1, 1)),
                                 i -> md5(toks[i] || ' ' || toks[i+1] ||
                                          ' ' || toks[i+2])) AS h
           FROM t),
    fp AS (SELECT doc_id,
                  list_distinct(
                    list_transform(range(1, greatest(len(h) - 2, 1)),
                                   i -> list_aggregate(
                                          list_slice(h, i, i + 3),
                                          'min'))) AS fps,
                  list_distinct(h) AS hs
           FROM kg),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM (SELECT doc_id, unnest(fps) AS fp FROM fp) a
             JOIN (SELECT doc_id, unnest(fps) AS fp FROM fp) b
               ON a.fp = b.fp AND a.doc_id < b.doc_id),
    p AS (SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(fa.hs, fb.hs)) AS BIGINT) AS inter,
                 CAST(len(fa.hs) AS BIGINT) AS sz_a,
                 CAST(len(fb.hs) AS BIGINT) AS sz_b
          FROM cand c JOIN fp fa ON fa.doc_id = c.id_a
                      JOIN fp fb ON fb.doc_id = c.id_b)
    SELECT id_a, id_b, inter, sz_a, sz_b,
           CAST(inter AS DOUBLE) / least(sz_a, sz_b) AS containment
    FROM p WHERE inter * 2 >= least(sz_a, sz_b)
    """,
    doc="Containment near-dup — the asymmetric complement of Jaccard "
    "dedup (z86) that catches a short document embedded inside a long "
    "one, where Jaccard is diluted by the length gap (the MOSS/"
    "plagiarism shape). Candidates come from z66's winnowing "
    "fingerprints (shared window-min hash => guaranteed shared "
    "substring run; sub-quadratic by construction — only docs sharing "
    "a fingerprint ever pair), then the 3-gram-hash-set containment "
    "|A∩B| / min(|A|,|B|) verifies each candidate — exact w.h.p.: the "
    "kgram sets are xxhash64-narrowed, so a 64-bit collision between "
    "distinct md5 kgrams within one doc could perturb the intersection "
    "(intersect the raw md5 arrays if strict exactness is ever "
    "required); the 0.5 threshold itself is applied in exact integer "
    "math (inter*2 >= min-size) so no float boundary exists. "
    "Shuffles: fingerprint "
    "explode + self-equi-join on fp, then two pair⋈array joins keyed "
    "doc_id — each candidate pair carries the two xxhash64-narrowed "
    "kgram-set arrays once and intersects them in a single JVM "
    "array_intersect (hash-set, O(|A|+|B|) per pair). The r10-era "
    "explode-join verify shuffled the candidate×kgram row product "
    "(~1.7B rows at the 26x tier) through two joins + a pair agg; "
    "the array form moves 8.7M pairs + compact arrays instead — "
    "measured 20.5s -> 4.9s (10x tier) / 94.7s -> 32.3s (26x), "
    "bit-identical output at every tier (dedup family #7).",
)
def z10658_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .q_text import WINNOW_K, WINNOW_W

    docs = load_table(spark, sf_dir, "documents")
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
    win_min = lambda i: F.array_min(  # noqa: E731
        F.slice(h, i + F.lit(1), WINNOW_W)
    )
    per_doc = with_hashes.select(
        "doc_id",
        F.array_distinct(
            F.when(
                m >= WINNOW_W,
                F.transform(F.sequence(F.lit(0), m - WINNOW_W), win_min),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("fps"),
        F.array_distinct(h).alias("hs"),
    # per_doc feeds three consumers (fingerprint explode, kgram explode,
    # sizes); without materialization Catalyst re-derives the md5-kgram +
    # winnowing tree per reference — measured 85 s -> ~5 s at sf0.01
    # (the z95 shared-subtree lesson).
    ).transform(materialize)
    fpx = per_doc.select("doc_id", F.explode("fps").alias("fp"))
    cand = (
        fpx.alias("a")
        .join(
            fpx.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # Verify with a per-pair array intersect, not an explode-join: the
    # kgram sets are re-hashed 32-char-md5 -> 8-byte xxhash64 once per
    # JOIN SIDE (hsx is re-derived for the id_a and id_b branches —
    # but over the CHECKPOINTED per_doc, so only the cheap transform
    # re-runs, never the md5/winnowing pipeline; that materialization
    # is the precondition that made pre-join narrowing a win here and
    # a confirmed regression in q_north's unmaterialized verify —
    # Spark-internal: both sides derive the same mapping and
    # distinct md5s stay distinct w.h.p., so intersection COUNTS are
    # unchanged — the oracle never sees these values), then each
    # candidate pair picks up both compact arrays through two doc_id
    # joins and intersects them JVM-side (array_intersect is hash-set
    # O(|A|+|B|)). The previous explode-join shape shuffled the
    # candidate×kgram ROW PRODUCT (~1.7B rows at the 26x tier, where
    # the candidate set itself stays data-linear — max fp bucket 25)
    # through two joins and a pair agg; the pair⋈array form was
    # measured bit-identical and 20.5s -> 4.9s at the 10x tier,
    # 94.7s -> 32.3s at 26x. A candidate-id semi-prune before the
    # array build stays pointless for the same reason as before:
    # winnowing fingerprints collide broadly (~334k candidate pairs
    # at sf0.1 touch nearly every doc), so the prune cuts few rows.
    hsx = per_doc.select(
        "doc_id",
        F.transform("hs", lambda x: F.xxhash64(x)).alias("hsx"),
        F.size("hs").cast("long").alias("sz"),
    )
    paired = cand.join(
        hsx.select(
            F.col("doc_id").alias("id_a"),
            F.col("hsx").alias("hs_a"),
            F.col("sz").alias("sz_a"),
        ),
        "id_a",
    ).join(
        hsx.select(
            F.col("doc_id").alias("id_b"),
            F.col("hsx").alias("hs_b"),
            F.col("sz").alias("sz_b"),
        ),
        "id_b",
    )
    out = paired.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("hs_a", "hs_b")).cast("long").alias("inter"),
        "sz_a",
        "sz_b",
    ).filter(F.col("inter") * 2 >= F.least("sz_a", "sz_b"))
    return out.select(
        "id_a",
        "id_b",
        "inter",
        "sz_a",
        "sz_b",
        (F.col("inter").cast("double") / F.least("sz_a", "sz_b")).alias(
            "containment"
        ),
    )


# --------------------------------------------------------------------------
# X53 — character-entropy quality signal
# --------------------------------------------------------------------------
@register(
    "z128253_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(list_transform(
               range(1, CAST(length(text) AS INT) + 1),
               i -> substr(text, i, 1))) AS c
      FROM documents),
    cc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS nc
           FROM ch GROUP BY doc_id, c),
    tot AS (SELECT doc_id, CAST(SUM(nc) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS distinct_chars
            FROM cc GROUP BY doc_id),
    term AS (SELECT cc.doc_id,
                    CAST(round((CAST(cc.nc AS DOUBLE) / t.n)
                               * log2(CAST(t.n AS DOUBLE) / cc.nc), 6)
                         AS DECIMAL(18,6)) AS h
             FROM cc JOIN tot t USING (doc_id))
    SELECT term.doc_id,
           ANY_VALUE(t.n) AS n_chars,
           ANY_VALUE(t.distinct_chars) AS distinct_chars,
           CAST(SUM(term.h) AS DOUBLE) AS entropy_bits
    FROM term JOIN tot t USING (doc_id)
    GROUP BY term.doc_id
    """,
    doc="Character-entropy quality signal: per-document Shannon entropy "
    "over the character distribution — the cheap gibberish/binary-"
    "junk/keyboard-mash detector (low entropy = repeated chars, high "
    "= random bytes; natural text sits in a narrow band). Each "
    "(nc/n)*log2(n/nc) term is rounded to 6dp and summed as "
    "DECIMAL(18,6) — the q71 transcendental rule, making the entropy "
    "hash-stable cross-engine. Shuffles: one (doc, char) count agg "
    "(alphabet-bounded fan-in), one doc agg. The char explode is the "
    "cost; at 100 TB fold it into the same pass as the other "
    "per-char signals (quality-filter mandate).",
)
def z128253_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # split on the zero-width (?!^) lookahead yields one element per
    # char PLUS a trailing "" (Spark keeps trailing empties); drop it.
    ch = docs.select(
        "doc_id", F.explode(F.split("text", "(?!^)")).alias("c")
    ).filter(F.col("c") != "")
    cc = ch.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("long").alias("nc")
    )
    tot = cc.groupBy("doc_id").agg(
        F.sum("nc").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("distinct_chars"),
    )
    term = cc.join(tot, "doc_id").select(
        "doc_id",
        "n",
        "distinct_chars",
        F.round(
            (F.col("nc").cast("double") / F.col("n"))
            * F.log2(F.col("n").cast("double") / F.col("nc")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("h"),
    )
    return term.groupBy("doc_id").agg(
        F.first("n").alias("n_chars"),
        F.first("distinct_chars").alias("distinct_chars"),
        F.sum("h").cast("double").alias("entropy_bits"),
    )


# --------------------------------------------------------------------------
# X54 — top-k tokens per source (WindowGroupLimit shape)
# --------------------------------------------------------------------------
@register(
    "z128254_topk_tokens_per_source",
    oracle="""
    WITH tc AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT source,
                             unnest(string_split(text, ' ')) AS token
                      FROM documents)
                GROUP BY source, token),
    r AS (SELECT source, token, cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, token) AS rank
          FROM tc)
    SELECT source, token, cnt, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """,
    doc="Top-5 tokens per source by frequency — the per-slice vocabulary "
    "summary every dataset card carries. One count agg keyed "
    "(source, token), then a rank window that Spark executes as "
    "WindowGroupLimit: each task keeps only 5 rows per source BEFORE "
    "the shuffle, so the window never materializes the full "
    "vocabulary per group (the z32 top-k-per-group shape applied to "
    "text). Ties break on the token string (dataset-card mandate).",
)
def z128254_topk_tokens_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        tc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "token", "cnt", F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# X55 — script/charclass profile (regexp_count kit)
# --------------------------------------------------------------------------
@register(
    "z128255_script_profile",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT)
             AS n_upper,
           CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT)
             AS n_lower,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
             AS n_digit,
           CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
             AS n_punct,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             / length(text) AS alpha_ratio
    FROM documents
    """,
    doc="Character-class profile per document: upper/lower/digit/space/"
    "punctuation counts and the alphabetic ratio — the script-level "
    "companion to z63's n-gram language ID (catches ALL-CAPS shouting, "
    "digit-heavy tables, punctuation soup before any model sees the "
    "text). Pure expression-level regexp_count in the Java-regex/RE2 "
    "common subset; zero shuffles, full codegen; the ratio is one "
    "division of exact integers (quality-filter mandate).",
)
def z128255_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rc = lambda pat: F.regexp_count("text", F.lit(pat)).cast("long")  # noqa: E731
    return docs.select(
        "doc_id",
        rc("[A-Z]").alias("n_upper"),
        rc("[a-z]").alias("n_lower"),
        rc("[0-9]").alias("n_digit"),
        rc(" ").alias("n_space"),
        rc("[^A-Za-z0-9 ]").alias("n_punct"),
        (
            F.regexp_count("text", F.lit("[A-Za-z]")).cast("double")
            / F.length("text")
        ).alias("alpha_ratio"),
    )


# --------------------------------------------------------------------------
# X56 — token-count Gini coefficient per source
# --------------------------------------------------------------------------
@register(
    "z128256_length_gini",
    oracle="""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS x
               FROM documents),
    r AS (SELECT source, x,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY x, doc_id) AS i
          FROM d)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(x) AS BIGINT) AS total_tokens,
           CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
             / (COUNT(*) * SUM(x)) AS gini
    FROM r GROUP BY source
    """,
    doc="Gini coefficient of document token counts per source — the "
    "length-inequality diagnostic for data mixing (a source whose "
    "token mass is concentrated in a few giant docs packs/chunks very "
    "differently from a uniform one). Computed by the sorted-index "
    "formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with ties "
    "broken by doc_id, so every sum is an exact BIGINT and the gini "
    "is one final double division — bit-identical cross-engine. One "
    "per-source sort window + one agg; at 100 TB the sort is "
    "range-partitioned per source (mixing mandate).",
)
def z128256_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("x"),
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    r = d.select("source", "x", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    sx = F.sum("x")
    six = F.sum(F.col("i") * F.col("x"))
    return r.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        sx.cast("long").alias("total_tokens"),
        ((2 * six - (n + 1) * sx).cast("double") / (n * sx)).alias("gini"),
    )


# --------------------------------------------------------------------------
# X57 — join-key skew profile
# --------------------------------------------------------------------------
def _skew_one(df: DataFrame, key: str) -> DataFrame:
    per = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return per.agg(
        F.lit(key).alias("key_name"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
        (
            (F.max("c") * F.count(F.lit(1))).cast("double")
            / F.sum("c")
        ).alias("skew_ratio"),
    )


@register(
    "z128257_key_skew_profile",
    oracle="""
    {}
    """.format(
        " UNION ALL ".join(
            f"""
    SELECT '{k}' AS key_name,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           CAST(MAX(c) * COUNT(*) AS DOUBLE) / SUM(c) AS skew_ratio
    FROM (SELECT {k}, CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem GROUP BY {k})"""
            for k in ("l_orderkey", "l_partkey", "l_suppkey")
        )
    ),
    doc="Join-key skew profile over the fact table's three join keys: "
    "rows, distinct keys, the heaviest key's row count, and the skew "
    "ratio max_key_rows / mean_key_rows — the diagnostic that decides "
    "(before a 100 TB join is launched) whether a key needs the q68 "
    "salting treatment or AQE skew-split will do. One count agg per "
    "key (partial-agg shuffles) reduced to one row each; the ratio is "
    "exact-integer-derived (ops mandate; pairs with q68 and the AQE "
    "skew config in session.py).",
)
def z128257_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = _skew_one(li, "l_orderkey")
    for k in ("l_partkey", "l_suppkey"):
        out = out.unionAll(_skew_one(li, k))
    return out


# --------------------------------------------------------------------------
# Q79 — reporting composite (TPC-H Q3 shape): filter x3 -> join x2 ->
# agg -> top-k
# --------------------------------------------------------------------------
@register(
    "z139179_top_revenue",
    oracle="""
    SELECT l.l_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="The TPC-H Q3 composite — the one query shape every reporting "
    "user runs: three pushed-down filters (segment, order date, ship "
    "date), a dimension-to-fact join chain, a decimal-exact revenue "
    "aggregate, and a global top-10. What the plan must show (and "
    "tests assert across its constituent operators): all three "
    "predicates in PushedFilters at the scans, customer broadcast "
    "(segment-filtered dimension), revenue summed as DECIMAL before "
    "the final double cast (partition-order-proof), TakeOrdered for "
    "the top-10 instead of a full sort. Composite of z02/z09/z19/z38 "
    "machinery in one Catalyst plan — the end-to-end smoke a new "
    "deployment runs first.",
)
def z139179_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Y67 — corpus-internal duplicate-ngram fraction (overflow tier)
# --------------------------------------------------------------------------
@register(
    "q128301_duplicate_ngram_filter",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(tk) - 6, 1)),
                   i -> array_to_string(tk[i:i+7], ' ')))) AS gram
          FROM t),
    df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
           FROM g GROUP BY gram),
    p AS (SELECT g.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup_grams
          FROM g JOIN df USING (gram) GROUP BY g.doc_id)
    SELECT doc_id, n_grams, n_dup_grams,
           CAST(n_dup_grams AS DOUBLE) / n_grams AS dup_frac,
           10 * n_dup_grams >= 3 * n_grams AS is_dup_heavy
    FROM p
    """,
    doc="Corpus-INTERNAL duplicate n-gram fraction — the MassiveText/"
    "Gopher 'repetition across documents' filter, distinct from z75 "
    "(which checks against an external eval set) and from pairwise "
    "near-dup (which needs a similar PARTNER): a doc whose 8-gram "
    "shingles mostly appear in other docs is boilerplate-heavy even "
    "when no single partner is similar. Per-doc distinct 8-grams, a "
    "gram-keyed document-frequency agg, join back, fraction + a 30% "
    "threshold applied in exact integer math (10*dup >= 3*total — no "
    "float boundary). Shuffles: gram-keyed agg + join, doc agg; grams "
    "only ever carry (doc_id, hashable string) — scale-safe like z75. "
    "Since r12 the per-doc gram table is the shared memoized build "
    "(functions/grams.py, ridden by q775) "
    "(corpus-hygiene mandate; overflow tier, rotation candidate).",
)
def q128301_duplicate_ngram_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.grams import doc_grams8

    # Shared memoized gram table (functions/grams.py); q775 rides the
    # same build.
    g = doc_grams8(spark, sf_dir).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    df_tbl = g.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("df"))
    p = (
        g.join(df_tbl, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
        )
    )
    return p.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias(
            "dup_frac"
        ),
        (10 * F.col("n_dup_grams") >= 3 * F.col("n_grams")).alias(
            "is_dup_heavy"
        ),
    )


# --------------------------------------------------------------------------
# Y68 — quality-aware canonical selection per near-dup cluster (overflow)
# --------------------------------------------------------------------------
@register(
    "q128302_keep_longest_canonical",
    oracle=None,  # set below after import (composes q_north._CC_CTE)
    doc="Quality-aware cluster dedupe: same exact-verified near-dup "
    "clusters as z85 (prefix-filtered Jaccard pairs -> connected "
    "components), but the survivor per cluster is the LONGEST member "
    "(most tokens, ties to the lowest doc_id) instead of the min-id — "
    "the policy real pipelines use, because the min-id member may be "
    "the truncated copy. Selection is one row_number window per "
    "cluster on (n_tokens DESC, doc_id). Oracle: the shared recursive-"
    "CTE component labeling plus the same window. Scale: CC is "
    "O(log n) keyed shuffles (functions/graph.py); the argmax window "
    "shuffles once on the cluster key (dedup-policy mandate; overflow "
    "tier, rotation candidate).",
)
def q128302_keep_longest_canonical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Shared memoized components over the exact-verified pair graph
    # (functions/neardup.py — one CC run per session serves z85 too).
    from ..functions.neardup import components

    docs_raw = load_table(spark, sf_dir, "documents")
    comp = components(spark, sf_dir)
    m = (
        docs_raw.join(comp, docs_raw["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("cluster"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return m.select(
        "doc_id",
        "cluster",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def _set_y68_oracle() -> None:
    from .q_north import _CC_CTE
    from .registry import REGISTRY, QuerySpec

    spec = REGISTRY["q128302_keep_longest_canonical"]
    oracle = _CC_CTE + """
    , m AS (SELECT d.doc_id,
                   CAST(COALESCE(c.component, d.doc_id) AS BIGINT)
                     AS cluster,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT)
                     AS n_tokens
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
    SELECT doc_id, cluster, n_tokens,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY n_tokens DESC, doc_id) = 1
             AS is_kept
    FROM m
    """
    REGISTRY["q128302_keep_longest_canonical"] = QuerySpec(
        name=spec.name, fn=spec.fn, oracle=oracle, doc=spec.doc
    )


_set_y68_oracle()


# --------------------------------------------------------------------------
# Y69 — regional revenue composite (TPC-H Q5 shape, overflow tier)
# --------------------------------------------------------------------------
@register(
    "z128303_regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="The TPC-H Q5 composite — six-table join with the local-supplier "
    "condition (customer and supplier in the same nation), a year "
    "filter, and per-nation decimal-exact revenue. Exercises what no "
    "single-operator query does: join ORDER planning across a "
    "fact-to-fact (lineitem-supplier) edge plus a snowflake of "
    "dimensions, where Catalyst must broadcast the small dims "
    "(region/nation/supplier after pruning) and keep the fact join "
    "shuffled. The c_nationkey = s_nationkey condition rides the "
    "supplier join as a residual — no extra shuffle (reporting "
    "composite #2; overflow tier, rotation candidate).",
)
def z128303_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )
