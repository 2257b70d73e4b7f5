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
        # ts is INT64 TIMESTAMP(NANOS) in the footer; Spark reads it as long
        # (legacy.parquet.nanosAsLong) — convert ns -> microsecond timestamp.
        # The fixture is us-precision (verified: no sub-us components), so
        # the div-1000 truncation is exact and matches DuckDB's
        # TIMESTAMP_NS -> TIMESTAMP cast.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view so each operator is also
    reachable via spark.sql() — keeps parity with the DuckDB oracle
    trivially auditable (SURVEY.md §3, entry point 2)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
