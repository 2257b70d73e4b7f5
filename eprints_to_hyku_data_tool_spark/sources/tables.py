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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view so each operator is also
    reachable via spark.sql() — keeps parity with the DuckDB oracle
    trivially auditable (SURVEY.md §3, entry point 2)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
