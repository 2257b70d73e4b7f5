"""Skew mitigation: salted joins (assignment mandate: 'salting for skew').

AQE's OptimizeSkewedJoin (enabled in session.py) splits skewed partitions
at runtime and is the first line of defense. Salting is the declarative
fallback for EXTREME single-key skew (one key holding a double-digit
percentage of rows), where even a split partition bottlenecks on the
final merge: the large side spreads each key over n salt buckets, the
small side replicates each row n times, and the join key becomes
(key, salt) — n-way parallelism on the hot key at the cost of an n-fold
replication of the small side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side to a small side on an equi key, salted.

    The salt on the large side only has to spread rows of the same key
    across buckets — any per-row value works and CANNOT change the join
    result, so a seeded rand() is fine (the result set is identical for
    every salt assignment; only the partitioning differs).
    """
    salted_large = large.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_large.join(
        replicated_small,
        (salted_large[large_key] == replicated_small[small_key])
        & (salted_large[SALT_COL] == replicated_small[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)


def top_heavy_keys(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Skew diagnosis: the top-n heaviest keys with their row share —
    run this before deciding between AQE-only and salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top_n)
    )
