"""Fixture-table access (TESTDATA.md): one parquet file per table.

At 100 TB each "table" would be a partitioned parquet/iceberg dataset; the
reader below is already directory-agnostic (``spark.read.parquet`` takes a
file or a partitioned directory identically), so nothing here changes at
scale — only the paths do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan with Catalyst pushdown: filters/projections applied by
    callers reach the parquet reader (verified in tests via explain())."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The fixture's ts column has shipped in two physical layouts:
        # INT64 TIMESTAMP(NANOS) (read as long under
        # legacy.parquet.nanosAsLong) and plain TIMESTAMP(MICROS)
        # (read as timestamp / timestamp_ntz). Normalize both to session-tz
        # TimestampType so every downstream plan and oracle sees identical
        # wall-clock values (session tz is pinned to UTC in session.py).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ns-as-long; fixture is us-precision so div-1000 is exact.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, TimestampNTZType):
            # Pin the NTZ wall-clock to the UTC instant REGARDLESS of
            # spark.sql.session.timeZone. NOT to_utc_timestamp(ts,'UTC'):
            # Spark first implicitly casts NTZ -> TIMESTAMP in the
            # SESSION zone, after which tz='UTC' is an identity — the
            # r14 form still shifted every event by hours on any
            # externally built non-UTC session (advice r14, verified on
            # 4.1.2: session tz America/New_York, NTZ 12:00 -> 16:00Z
            # via to_utc_timestamp vs 12:00Z via this expression). And
            # NOT to_timestamp(convert_timezone('UTC', session, ts)):
            # that round trip re-renders the instant as a SESSION-zone
            # wall-clock, which is ambiguous in the DST fall-back hour —
            # to_timestamp resolves the repeated local hour with the
            # earlier offset, silently shifting ~1h/year of instants per
            # DST zone (code-review r15, confirmed: NTZ 2024-11-03
            # 06:30 under America/New_York -> 05:30Z). make_timestamp
            # consumes the NTZ FIELDS directly and interprets them in
            # the named zone, so no local-zone rendering ever happens;
            # date_part('SECOND') carries the fractional micros.
            df = df.withColumn(
                "ts",
                F.expr(
                    "make_timestamp(year(ts), month(ts), day(ts), "
                    "hour(ts), minute(ts), date_part('SECOND', ts), "
                    "'UTC')"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view so each operator is also
    reachable via spark.sql() — keeps parity with the DuckDB oracle
    trivially auditable (SURVEY.md §3, entry point 2)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
