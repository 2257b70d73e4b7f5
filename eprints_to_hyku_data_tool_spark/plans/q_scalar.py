"""Scalar function kits: SURVEY.md §2.8 Q43-Q53.

The reference repo has no code (SURVEY.md §0); this is the expression
surface every field mapping in an EPrints->Hyku ETL touches: string
normalization, identifier regexes, fuzzy matching, date coercion, math,
array/map/json manipulation, hash id generation, null handling, casts.

All pure row-level expressions — no shuffle anywhere except the handful of
small group-bys; everything stays inside whole-stage codegen. Dialect
deltas vs the DuckDB oracle are resolved per-query in the oracle SQL
(documented inline): no initcap in DuckDB (explicit formula both sides),
strftime vs date_format patterns, date_diff argument order, len()->BIGINT
vs size()->INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Q43 — string cleanup kit (name normalization)
# --------------------------------------------------------------------------
@register(
    "z10643_string_kit",
    oracle="""
    SELECT c_custkey,
           lower(trim(c_name)) AS clean_name,
           regexp_replace(lower(c_name), '#0*', '_') AS slug,
           substring(c_name, 1, 8) AS prefix8,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           CAST(length(c_name) AS BIGINT) AS name_len,
           upper(substring(lower(trim(c_name)), 1, 1))
             || substring(lower(trim(c_name)), 2) AS capitalized,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tagged,
           split_part(c_name, '#', 2) AS name_number
    FROM customer
    """,
    doc="String normalization kit: trim/lower/regexp_replace/substring/"
    "lpad/length/concat_ws/split_part + explicit first-letter "
    "capitalization (DuckDB has no initcap; the same formula runs on "
    "both sides) (SURVEY §2.8 Q43).",
)
def z10643_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    clean = F.lower(F.trim(F.col("c_name")))
    return cust.select(
        "c_custkey",
        clean.alias("clean_name"),
        F.regexp_replace(F.lower("c_name"), "#0*", "_").alias("slug"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.length("c_name").cast("long").alias("name_len"),
        # equivalent to the oracle's explicit upper(first)+rest formula for
        # these single-word names; initcap keeps the codegen'd expression
        # tree small (clean would otherwise inline 3x)
        F.initcap(clean).alias("capitalized"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "tagged"
        ),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_number"),
    )


# --------------------------------------------------------------------------
# Q44 — regex extraction (identifier parsing)
# --------------------------------------------------------------------------
@register(
    "z10644_regex_extract",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
           regexp_extract(p_type, '(ECONOMY|PROMO|STANDARD|SMALL|MEDIUM|LARGE)', 1)
             AS type_class
    FROM part
    """,
    doc="Regex extraction: first token, numeric id out of 'Brand#NN', "
    "class keyword — the DOI-out-of-URL pattern. Both engines return '' "
    "on no match (SURVEY §2.8 Q44).",
)
def z10644_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_extract(
            "p_type", r"(ECONOMY|PROMO|STANDARD|SMALL|MEDIUM|LARGE)", 1
        ).alias("type_class"),
    )


# --------------------------------------------------------------------------
# Q45 — fuzzy string match (record-linkage kit)
# --------------------------------------------------------------------------
@register(
    "z10645_fuzzy_match",
    oracle="""
    SELECT c_custkey, s_suppkey, c_name, s_name,
           CAST(levenshtein(lower(c_name), lower(s_name)) AS BIGINT) AS edit_dist,
           substring(lower(trim(c_name)), 1, 4)
             = substring(lower(trim(s_name)), 1, 4) AS same_block
    FROM customer JOIN supplier ON c_custkey = s_suppkey
    """,
    doc="Fuzzy-match kit: levenshtein distance + prefix blocking key over "
    "a keyed customer/supplier pairing. At scale the blocking key is the "
    "join key (block first, O(n) pairs per block), never all-pairs "
    "levenshtein. soundex is Spark-only (no DuckDB equivalent) and "
    "exercised in tests, not in the oracle (SURVEY §2.8 Q45).",
)
def z10645_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    blk = lambda c: F.substring(F.lower(F.trim(c)), 1, 4)  # noqa: E731
    return (
        cust.join(supp, cust.c_custkey == supp.s_suppkey)
        .select(
            "c_custkey",
            "s_suppkey",
            "c_name",
            "s_name",
            F.levenshtein(F.lower("c_name"), F.lower("s_name"))
            .cast("long")
            .alias("edit_dist"),
            (blk(F.col("c_name")) == blk(F.col("s_name"))).alias("same_block"),
        )
    )


# --------------------------------------------------------------------------
# Q46 — date/time kit (monthly rollup)
# --------------------------------------------------------------------------
@register(
    "z10646_date_kit",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m') AS ym,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           last_day(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_end,
           CAST(date_diff('day',
                          CAST(date_trunc('month', o_orderdate) AS DATE),
                          last_day(CAST(date_trunc('month', o_orderdate) AS DATE)))
                AS INT) + 1 AS days_in_month,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
                + INTERVAL 30 DAY AS DATE) AS month_start_plus30,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(epoch_us(o_orderdate)) AS BIGINT) AS first_order_us,
           CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_order_us
    FROM orders
    GROUP BY ALL
    """,
    doc="Date/time kit: date_trunc, format (strftime '%Y-%m' == Java "
    "'yyyy-MM'), year/month extraction, last_day, datediff (DuckDB "
    "date_diff('day', a, b) == Spark datediff(b, a) — argument order "
    "flips), date_add, epoch micros (SURVEY §2.8 Q46).",
)
def z10646_date_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month_start = F.date_trunc("month", "o_orderdate").cast("date")
    return (
        orders.groupBy(
            month_start.alias("order_month"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.last_day(month_start).alias("month_end"),
            (F.datediff(F.last_day(month_start), month_start) + F.lit(1)).alias(
                "days_in_month"
            ),
            F.date_add(month_start, 30).alias("month_start_plus30"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # o_orderdate is TIMESTAMP_NTZ in the footer; cast to TIMESTAMP
            # (identity under the pinned UTC session zone) for unix_micros.
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
                "first_order_us"
            ),
            F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
                "last_order_us"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q47 — math kit
# --------------------------------------------------------------------------
@register(
    "z10647_math_kit",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_retailprice - 1000.0) AS dist_from_1k,
           round(ln(p_retailprice), 4) AS log_price,
           pow(CAST(p_size AS DOUBLE), 2.0) AS size_sq,
           sqrt(p_retailprice) AS price_sqrt,
           greatest(p_retailprice, 500.0) AS at_least_500,
           least(p_retailprice, 1500.0) AS at_most_1500,
           p_size % 7 AS size_mod7
    FROM part
    """,
    doc="Math kit: round/floor/ceil/abs/ln/pow/sqrt/greatest/least/mod "
    "over positive prices (round half-away vs half-up only differs at "
    "exact .5 boundaries, unreachable for these binary doubles). ln is "
    "rounded to 4dp on both sides: transcendentals are not bit-portable "
    "across libm implementations (Java vs C differ in the last ulp) "
    "(SURVEY §2.8 Q47, §5 rounding rule).",
)
def z10647_math_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(price, 1).alias("price_r1"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 1000.0).alias("dist_from_1k"),
        F.round(F.log(price), 4).alias("log_price"),
        F.pow(F.col("p_size").cast("double"), 2.0).alias("size_sq"),
        F.sqrt(price).alias("price_sqrt"),
        F.greatest(price, F.lit(500.0)).alias("at_least_500"),
        F.least(price, F.lit(1500.0)).alias("at_most_1500"),
        (F.col("p_size") % 7).alias("size_mod7"),
    )


# --------------------------------------------------------------------------
# Q48 — array kit (tokenized multi-value fields)
# --------------------------------------------------------------------------
@register(
    "z10648_array_kit",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           array_to_string(
             list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3),
             '|') AS first3_sorted,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4))
                AS INT) AS n_long_tokens
    FROM documents
    """,
    doc="Array kit over tokenized text: split/size/array_distinct/"
    "sort_array/slice/array_join/array_contains + a filter() "
    "higher-order function — the multi-valued-field toolbox "
    "(SURVEY §2.8 Q48).",
)
def z10648_array_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), "|"
        ).alias("first3_sorted"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
    )


# --------------------------------------------------------------------------
# Q49 — map kit (map round-trip; oracle is the plain relational equivalent)
# --------------------------------------------------------------------------
@register(
    "z10649_map_kit",
    oracle="""
    WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type, n_events,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS INT) AS n_types
    FROM c
    """,
    doc="Map kit: per-user counts are folded into a map<string,long> "
    "(map_from_entries), inspected (map_keys size), then exploded back to "
    "rows. The oracle is the equivalent relational form — proving the "
    "map round-trip loses nothing (SURVEY §2.8 Q49).",
)
def z10649_map_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n_events"))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.explode("type_counts").alias("event_type", "n_events"),
        F.size(F.map_keys("type_counts")).alias("n_types"),
    ).select("user_id", "event_type", "n_events", "n_types")


# --------------------------------------------------------------------------
# Q50 — JSON kit (props extraction)
# --------------------------------------------------------------------------
@register(
    "z10650_json_kit",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY k_band
    """,
    doc="JSON kit: get_json_object path extraction + typed cast, banded "
    "aggregation. from_json (schema-applied parse) is proven equivalent "
    "in tests; the oracle uses DuckDB json_extract_string "
    "(SURVEY §2.8 Q50).",
)
def z10650_json_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.expr("k div 10").cast("int").alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------------
# Q51 — hash / id generation (Bulkrax source_identifier)
# --------------------------------------------------------------------------
@register(
    "z10651_hash_ids",
    oracle="""
    SELECT o_orderkey,
           md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                         o_orderpriority)) AS source_identifier,
           sha256(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderpriority))
             AS sha_id
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    doc="Deterministic id generation: md5 / sha2-256 over a concat_ws of "
    "natural keys — the Bulkrax source_identifier pattern. xxhash64 is "
    "Spark-only (no DuckDB equivalent) and covered by tests "
    "(SURVEY §2.8 Q51).",
)
def z10651_hash_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    )
    key = F.col("o_orderkey").cast("string")
    return orders.select(
        "o_orderkey",
        F.md5(F.concat_ws("|", key, "o_orderstatus", "o_orderpriority")).alias(
            "source_identifier"
        ),
        F.sha2(F.concat_ws("|", key, "o_orderpriority"), 256).alias("sha_id"),
    )


# --------------------------------------------------------------------------
# Q52 — null kit
# --------------------------------------------------------------------------
@register(
    "z10652_null_kit",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_status_p,
           CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P')
                              IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'F')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
           CAST(SUM(CAST(COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL
                                       ELSE o_totalprice END, 0.0)
                         AS DECIMAL(18,2))) AS DOUBLE) AS total_non_p,
           CAST(SUM(CASE WHEN isnan(o_totalprice) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nan
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Null kit: nullif / coalesce / null-safe equality (<=> == IS NOT "
    "DISTINCT FROM) / isnan, folded into per-status QA counters "
    "(SURVEY §2.8 Q52).",
)
def z10652_null_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    not_p = F.nullif(status, F.lit("P"))
    not_f = F.nullif(status, F.lit("F"))
    price_or_null = F.when(status == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(not_p.isNull(), 1).otherwise(0)).alias("n_status_p"),
        F.sum(F.when(not_p.eqNullSafe(not_f), 1).otherwise(0)).alias(
            "n_nullsafe_eq"
        ),
        F.sum(F.coalesce(price_or_null, F.lit(0.0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("total_non_p"),
        F.sum(F.when(F.isnan("o_totalprice"), 1).otherwise(0)).alias("n_nan"),
    )


# --------------------------------------------------------------------------
# Q53 — cast / coercion kit (stringly-typed edges)
# --------------------------------------------------------------------------
@register(
    "z10653_cast_kit",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS reparsed_date,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_double,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_as_double,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    doc="Cast/coercion kit: string->date round-trip, try_cast null-on-"
    "error (bad_double is always NULL), string->double, double->"
    "decimal(12,2) — the stringly-typed-source edge (SURVEY §2.8 Q53). "
    "The decimal is EMITTED as its canonical 2-dp string: decimal output "
    "columns hash differently per engine in the driver canonicalizer "
    "(r2's q01 regression), so final schemas are decimal-free fleet-wide.",
)
def z10653_cast_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 0
    )
    return orders.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "reparsed_date"
        ),
        F.expr("try_cast(o_orderstatus AS DOUBLE)").alias("bad_double"),
        F.expr("try_cast(CAST(o_orderkey AS STRING) AS DOUBLE)").alias(
            "key_as_double"
        ),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
    )
