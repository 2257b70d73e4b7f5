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

Exact all-pairs (q18/q67) goes through ``similarity_pairs_chunked``: a
distributed block-nested-loop with NO driver-side collect — see its
docstring for the shuffle/memory accounting. At 100 TB the sub-quadratic
alternatives are the LSH/SimHash/IVF candidate pipelines in q_north.
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


def similarity_pairs_chunked(
    emb_df, tau: float, spark, n_chunks: int | None = None,
    rows_per_chunk: int = 4096,
):
    """All-pairs cosine >= tau as a DISTRIBUTED block-nested-loop — the
    exact form with no driver-side materialization (VERDICT r2 items 2/3
    replaced the collect+broadcast kernel with this).

    Shape: vectors are hashed into ``n_chunks`` chunks; an IN-PLAN
    ``explode(sequence(0, C-1))`` replicates each row into the C
    unordered chunk-pairs its chunk participates in; one
    ``groupBy(pair_id).applyInPandas`` task then matmuls chunk_i x
    chunk_j (or the triangle of chunk_i when i == j). Every unordered
    row pair meets in EXACTLY one group, so the result is exact with no
    dedupe pass. The replication is pure Catalyst — no membership table
    at all (code-review r15: the old driver-built membership list was
    O(C^3) Python time and O(C^2) broadcast rows; at the size-driven
    C for n=1e8 vectors that was ~5 days of driver CPU and a ~600M-row
    broadcast before any Spark work started — measured cubic at small
    C). pair_id is a BIGINT: i*C+j overflows int32 past C=46340, i.e.
    ~1.9e8 rows at the default rows_per_chunk (same review).

    Duplicate keys: every copy of a vec_id hashes to the same chunk, so
    all copies meet in that chunk's diagonal (i == j) group, where the
    kernel raises loudly — a duplicated key would otherwise land its
    pairs on the diagonal's ``ids < ids`` filter and silently vanish
    from the "exact" result.

    ``n_chunks`` is SIZE-DRIVEN by default (code-review r13: a fixed
    default put a quarter of the corpus into one Arrow group past
    fixture scale): C = max(8, ceil(n / rows_per_chunk)), so a chunk
    holds ~rows_per_chunk vectors and the per-task sims block stays
    ~rows_per_chunk^2 doubles (128 MB at the 4096 default) however big
    the corpus. Costs one column-pruned count() — noise next to the
    O(n^2) work that follows. Pass an explicit n_chunks to skip it.

    Scale accounting (the honest version of "exact all-pairs at 100 TB"):
      - driver memory: O(1) — the chunk-pair fan-out is an in-plan
        explode, nothing is built or broadcast from the driver;
      - shuffle: O(n * C * d) bytes (each vector is replicated C times);
      - peak task memory: 2n/C vectors + the (n/C)^2 sims block — the
        size-driven C keeps both constant as n grows; tasks grow as C^2,
        which a 1000-executor cluster absorbs;
      - compute: O(n^2 d / cluster) — irreducible for an EXACT result;
        the sub-quadratic paths are the LSH/SimHash/IVF families
        (q_north), which prune candidates instead.
    """
    import math

    import pandas as pd  # local import keeps the closure pickle-light

    if n_chunks is None:
        n = emb_df.count()
        n_chunks = max(8, math.ceil(n / rows_per_chunk))

    # chunk id from a hash of the key (stable under repartitioning).
    # Fan-out: a row in chunk c participates in the C unordered pairs
    # {(min(c,o), max(c,o)) : o in 0..C-1}; pair (c, c) arises exactly
    # once (o == c), every cross pair exactly once per side — so each
    # unordered ROW pair still meets in exactly one group. The explode
    # is whole-stage-codegen'd; pair_id is BIGINT arithmetic.
    c_lit = F.lit(n_chunks).cast("bigint")
    tagged = (
        emb_df.select("vec_id", "label", "embedding")
        .withColumn(
            "chunk", F.pmod(F.xxhash64("vec_id"), F.lit(n_chunks)).cast("int")
        )
        .withColumn(
            "other", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1)))
        )
        .withColumn(
            "pair_id",
            F.least("chunk", "other").cast("bigint") * c_lit
            + F.greatest("chunk", "other").cast("bigint"),
        )
        .drop("other")
    )

    schema = "id_a bigint, id_b bigint, label_a int, label_b int"

    def pairs_in_group(key, pdf):
        (pair_id,) = key
        i, j = divmod(int(pair_id), n_chunks)
        m = np.stack(pdf["embedding"].values).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        m /= norms
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        labels = pdf["label"].to_numpy(dtype=np.int32)
        chunk = pdf["chunk"].to_numpy()
        if i == j:
            # Loud duplicate-key guard (code-review r15): duplicates of
            # a vec_id all hash into this diagonal group; their pairs
            # would fail the ids < ids orientation filter and silently
            # vanish from the exact result.
            uniq, counts = np.unique(ids, return_counts=True)
            if (counts > 1).any():
                dupes = uniq[counts > 1][:5]
                raise ValueError(
                    "similarity_pairs_chunked: duplicate vec_id values "
                    f"{dupes.tolist()} — exact all-pairs requires a "
                    "unique key; dedupe the embedding table first"
                )
            sims = m @ m.T
            ia, ib = np.nonzero(sims >= tau)
            keep = ids[ia] < ids[ib]
        else:
            ai, bi = np.nonzero(chunk == i)[0], np.nonzero(chunk == j)[0]
            sims = m[ai] @ m[bi].T
            ra, rb = np.nonzero(sims >= tau)
            ia, ib = ai[ra], bi[rb]
            keep = np.ones(len(ia), dtype=bool)
        ia, ib = ia[keep], ib[keep]
        # orient (smaller id first) — cross-chunk hits can come either way
        lo = np.minimum(ids[ia], ids[ib])
        swap = ids[ia] != lo
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        return pd.DataFrame(
            {
                "id_a": ids[ia2],
                "id_b": ids[ib2],
                "label_a": labels[ia2],
                "label_b": labels[ib2],
            }
        )

    return tagged.groupBy("pair_id").applyInPandas(pairs_in_group, schema)
