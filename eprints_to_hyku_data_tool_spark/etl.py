"""EPrints -> Hyku (Bulkrax) ETL facade: SURVEY.md §1.1, §2.1 X01-X05.

The reference repo declares exactly this purpose and contains no code
(/root/reference/README.md:2, SURVEY.md §0); this module is the domain
pipeline rebuilt Spark-first: nested, multi-valued, stringly-typed EPrints
records flattened into delimiter-joined Bulkrax CSV rows.

Key semantics (SURVEY §1.1):
- ORDER PRESERVATION of multi-valued fields: creator order is
  bibliographic meaning. Arrays keep their JSON/XML order; vocabulary
  resolution uses posexplode + re-fold sorted by position, never a bare
  collect_list (nondeterministic order under a shuffle).
- Referential integrity: unmapped subject codes are dropped from the
  output row AND surfaced in a separate anti-join report.
- Type coercion at the edge: EPrints dates arrive as '2019', '2019-05',
  or '2019-05-07' and are normalized to full ISO dates.

Scale posture: the subject vocabulary is a broadcast dim; the only
shuffle is the posexplode->refold on (eprintid). Everything else is
row-level expression work inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPRINTS_SCHEMA = (
    "eprintid long, eprint_status string, type string, title string, "
    "abstract string, date string, ispublished string, "
    "creators array<struct<family:string,given:string,id:string>>, "
    "subjects array<string>, keywords string, official_url string, "
    "documents array<struct<main:string,format:string,filesize:long,security:string>>"
)

BULKRAX_COLUMNS = [
    "source_identifier",
    "title",
    "creator",
    "keyword",
    "subject",
    "resource_type",
    "date_created",
    "abstract",
    "official_url",
    "file",
]

# EPrints item type -> Hyku resource_type controlled vocabulary
RESOURCE_TYPE_MAP = {
    "article": "Article",
    "book_section": "Book chapter",
    "monograph": "Monograph",
    "conference_item": "Conference proceeding",
    "thesis": "Thesis",
}


def source_identifier(eprintid_col) -> F.Column:
    """Deterministic Bulkrax source_identifier (Q51 pattern)."""
    return F.md5(F.concat(F.lit("eprints:"), F.col(eprintid_col).cast("string")))


def normalize_date(date_col) -> F.Column:
    """'2019' -> '2019-01-01', '2019-05' -> '2019-05-01', full ISO kept."""
    d = F.trim(F.col(date_col))
    return (
        F.when(F.length(d) == 4, F.concat(d, F.lit("-01-01")))
        .when(F.length(d) == 7, F.concat(d, F.lit("-01")))
        .otherwise(d)
    )


def resolve_subjects(eprints: DataFrame, subject_map: DataFrame) -> DataFrame:
    """Ordered vocabulary resolution: posexplode subjects, broadcast-join
    the code->label map, re-fold labels sorted by original position.
    Unmapped codes drop out (inner join); see unmapped_subjects_report.

    Returns (eprintid, subject) with subject = '|'-joined labels.
    """
    exploded = eprints.select(
        "eprintid", F.posexplode("subjects").alias("pos", "code")
    )
    resolved = exploded.join(F.broadcast(subject_map), "code", "inner")
    refolded = (
        resolved.groupBy("eprintid")
        .agg(
            F.array_join(
                # refold in original position order: sort (pos, label)
                # structs, then project the label
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "label"))),
                    lambda s: s["label"],
                ),
                "|",
            ).alias("subject")
        )
    )
    return refolded


def unmapped_subjects_report(eprints: DataFrame, subject_map: DataFrame) -> DataFrame:
    """Referential-integrity report: (eprintid, code) pairs whose subject
    code has no vocabulary entry — the Q13 anti-join pattern."""
    exploded = eprints.select(
        "eprintid", F.explode("subjects").alias("code")
    )
    return exploded.join(F.broadcast(subject_map), "code", "left_anti").select(
        "eprintid", "code"
    )


def null_main_documents(eprints: DataFrame) -> DataFrame:
    """Referential-integrity report (code-review r15, the
    unmapped-subjects pattern applied to files): (eprintid, position)
    pairs for documents whose ``main`` is null — the entries
    eprints_to_bulkrax's ``file`` column deliberately drops. EPrints
    emits main=null for placeholder/derived documents; at import time
    the operator decides whether those rows need manual attachment."""
    return eprints.select(
        "eprintid",
        F.posexplode(F.coalesce("documents", F.array())).alias("pos", "doc"),
    ).filter(F.col("doc")["main"].isNull()).select("eprintid", "pos")


def eprints_to_bulkrax(eprints: DataFrame, subject_map: DataFrame) -> DataFrame:
    """The flagship domain transform: one Bulkrax CSV row per eprint."""
    resource_type = F.coalesce(
        *[
            F.when(F.col("type") == k, F.lit(v))
            for k, v in RESOURCE_TYPE_MAP.items()
        ],
        F.lit("Other"),
    )
    base = eprints.select(
        "eprintid",
        source_identifier("eprintid").alias("source_identifier"),
        F.regexp_replace(F.trim("title"), r"\s+", " ").alias("title"),
        F.array_join(
            F.transform(
                F.coalesce("creators", F.array()),
                lambda c: F.concat_ws(", ", c["family"], c["given"]),
            ),
            "|",
        ).alias("creator"),
        F.array_join(
            # filter(length > 0) after the trim (code-review r15,
            # verified): real EPrints keyword strings end with trailing
            # semicolons or contain ';;' — split() keeps the empty
            # segments and array_join would emit them as blank keyword
            # terms ('k1|k2|'), polluting the Hyku facet.
            F.filter(
                F.transform(
                    # single-arg lambda: transform's optional second
                    # (index) argument must not reach trim, which would
                    # read it as a trim-characters parameter
                    F.split(F.coalesce("keywords", F.lit("")), ";"),
                    lambda t: F.trim(t),
                ),
                lambda t: F.length(t) > 0,
            ),
            "|",
        ).alias("keyword"),
        resource_type.alias("resource_type"),
        normalize_date("date").alias("date_created"),
        F.coalesce("abstract", F.lit("")).alias("abstract"),
        F.coalesce("official_url", F.lit("")).alias("official_url"),
        F.array_join(
            # EXPLICIT null filter (code-review r15): array_join drops
            # null elements anyway, but silently — EPrints emits
            # main=null for placeholder/derived documents, and relying
            # on the join's implicit skip hid that files can vanish
            # from the row. The filter makes the semantics deliberate;
            # null_main_documents() below is the audit surface (the
            # unmapped-subjects pattern) for rows that lost files.
            F.filter(
                F.transform(
                    F.coalesce("documents", F.array()), lambda d: d["main"]
                ),
                lambda m: m.isNotNull(),
            ),
            "|",
        ).alias("file"),
    )
    subjects = resolve_subjects(eprints, subject_map)
    return (
        base.join(subjects, "eprintid", "left")
        .withColumn("subject", F.coalesce("subject", F.lit("")))
        .select(*BULKRAX_COLUMNS)
    )
