"""Vector similarity kernels (SURVEY.md §2.3 Q18, §2.11 Q61).

Two tiers, same semantics:

- ``cosine_expr``: pure Catalyst expression (zip_with + aggregate fold).
  Deterministic left-to-right double summation — bit-compatible with a
  sequential-sum SQL oracle. Higher-order functions are interpreted
  (no whole-stage codegen), so this is the *reference* form, not the hot
  path: ~70 s for 250k x 64-dim pairs on local[32].

- ``dot_udf`` / ``l2_normalize_udf``: Arrow-batched pandas UDFs over numpy.
  SIMD/pairwise summation (order differs from sequential), so results can
  differ from the expression form in the last ~ulp — callers must keep
  threshold decisions margin-safe (fixture margin around tau is >=1e-4,
  verified offline). ~100x faster; this is the 100 TB hot path.

At 100 TB neither form does all-pairs: q_north LSH-buckets first, then
applies these kernels inside buckets / against top-k candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(x: Column, y: Column) -> Column:
    """Sequential (index-order) double dot product as a Catalyst expression."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity, expression form (deterministic summation order)."""
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def l2_normalize_udf() -> "F.UserDefinedFunction":
    """L2-normalize an array column (Arrow batch -> one numpy matrix op).

    Built lazily: pandas_udf creation needs an active SparkSession, and
    this module must import without one.
    """

    @F.pandas_udf("array<double>")
    def _norm(v: pd.Series) -> pd.Series:
        m = np.stack(v.values).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return pd.Series(list(m / norms))

    return _norm


def dot_udf() -> "F.UserDefinedFunction":
    """Row-wise dot product of two array columns, vectorized per batch."""

    @F.pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.values).astype(np.float64)
        mb = np.stack(b.values).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return _dot


def normalized_matrix(rows: list, id_col: str, vec_col: str, label_col: str | None = None):
    """Build (ids, L2-normalized float64 matrix[, labels]) from collected rows."""
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    m /= norms
    if label_col is None:
        return ids, m
    return ids, m, np.array([r[label_col] for r in rows], dtype=np.int32)


def similarity_pairs_blocked(emb_df, tau: float, spark):
    """All-pairs cosine >= tau via blocked brute force.

    The build side (the whole table here) is collected and broadcast ONCE as
    a normalized numpy matrix; the probe side streams through mapInPandas,
    and each Arrow batch does a single (batch x dim) @ (dim x n) matmul.
    Every vector crosses the JVM->Python boundary exactly once — unlike a
    pairwise-join formulation, which ships both vectors per PAIR (O(n^2 d)
    bytes instead of O(n d)).

    Scale contract: the broadcast side must fit in executor memory (fine up
    to ~10M x 64 = 5 GB); beyond that use the LSH-bucketed path (q_north).
    The probe side is unbounded — it distributes over partitions.
    """
    import pandas as pd  # local import keeps the closure pickle-light

    rows = emb_df.select("vec_id", "label", "embedding").collect()
    bc = spark.sparkContext.broadcast(
        normalized_matrix(rows, "vec_id", "embedding", "label")
    )

    schema = "id_a bigint, id_b bigint, label_a int, label_b int"

    def gen(batches):
        ids_b, mat_b, labels_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf["embedding"].values).astype(np.float64)
            norms = np.linalg.norm(a, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            a /= norms
            sims = a @ mat_b.T
            ids_a = pdf["vec_id"].to_numpy(dtype=np.int64)
            labels_a = pdf["label"].to_numpy(dtype=np.int32)
            ia, ib = np.nonzero(sims >= tau)
            keep = ids_a[ia] < ids_b[ib]
            ia, ib = ia[keep], ib[keep]
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ia],
                    "id_b": ids_b[ib],
                    "label_a": labels_a[ia],
                    "label_b": labels_b[ib],
                }
            )

    return emb_df.select("vec_id", "label", "embedding").mapInPandas(gen, schema)
