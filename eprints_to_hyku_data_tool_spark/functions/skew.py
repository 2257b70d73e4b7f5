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

# Columns salted_pair_groups adds (plus its internals): inputs carrying
# any of these would be silently overwritten, so they are rejected.
_RESERVED = {"salt", "lo", "hi", "__k", "__sp", "__group_n"}


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

    Only LARGE-side-preserving join modes are valid: the small side is
    replicated n_salts times, so any mode that preserves small-side
    rows (right/full outer) would emit one null-extended row per salt
    bucket the large side missed — silently wrong counts. Rejected
    loudly here.
    """
    clash = [
        side
        for side, d in (("large", large), ("small", small))
        if SALT_COL in d.columns
    ]
    if clash:
        # The guard its sibling salted_pair_groups already has: the
        # withColumn would silently overwrite the caller's column and
        # the final drop(SALT_COL) removes EVERY column of that name —
        # the caller's data vanishes from the result without an error.
        raise ValueError(
            f"salted_join: input ({', '.join(clash)} side) already "
            f"carries {SALT_COL!r}; rename it before salting"
        )
    mode = how.lower().replace("_", "")
    if mode not in {
        "inner", "left", "leftouter", "leftsemi", "leftanti",
        "semi", "anti",
    }:
        raise ValueError(
            f"salted_join: join mode {how!r} preserves replicated "
            "small-side rows and would produce spurious null-extended "
            "results; use inner/left/left_semi/left_anti (salt the "
            "other side for right-preserving joins)"
        )
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


def salted_pair_groups(
    df: DataFrame,
    group_cols: tuple[str, ...],
    id_col: str,
    hot_rows: int,
) -> DataFrame:
    """Split hot PAIR-ENUMERATION groups into bounded salt-pair groups.

    The generic form of q74's round-9 hot-bucket mitigation (see
    plans/q_embed.py for the original derivation), shared by every
    grouped-map kernel that enumerates within-group pairs
    (LSH (band, sig) buckets, IVF cells): `groupBy(group_cols)
    .applyInPandas(pair_kernel)` makes the whole group ONE worker's ONE
    Arrow group — O(n_group) resident and O(n_group^2) CPU on a single
    core, the one skew cliff grouped-map semantics hide. So:

    - a tiny count agg (partial-agg shuffle of (group_cols, n) only —
      wide payload columns never ride it) finds groups past `hot_rows`;
    - the hot set joins back WITHOUT a broadcast hint: its worst case is
      rows/hot_rows entries — linear in data, so a mandatory broadcast
      would hit the driver/broadcast cap exactly when most groups run
      hot at corpus scale; AQE still broadcasts it whenever it is small
      (always, at fixture scale — the r12 de-hinting discipline);
    - each hot row gets salt s = xxhash64(id_col) mod k,
      k = ceil(n_group/hot_rows), and replicates to the k groups
      {(min(s, j), max(s, j)) : j < k}, so a pair with salts (i, j)
      co-locates in exactly the group (min(i,j), max(i,j)) and NO
      other — the union over groups is exactly the group's pair set
      with zero double-emits;
    - cold groups keep k = 1 -> the single (0, 0) group (plan
      unchanged vs unsalted).

    Downstream, group on (*group_cols, "lo", "hi") and make the kernel
    salt-aware: when lo != hi only different-salt pairs may be emitted
    (equal-salt pairs belong to their diagonal group). Per-group
    residency is bounded at ~2*hot_rows rows however big the group;
    total pair CPU stays the group's inherent O(n_group^2), spread over
    k(k+1)/2 cores instead of one.

    Returns df plus (salt, lo, hi) columns, rows replicated k-fold for
    hot groups only.
    """
    clash = _RESERVED & set(df.columns)
    if clash:
        raise ValueError(
            "salted_pair_groups would silently overwrite input column(s) "
            f"{sorted(clash)}; rename them before salting"
        )
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__group_n")
    )
    hot = counts.filter(F.col("__group_n") > hot_rows).select(
        *group_cols,
        F.ceil(F.col("__group_n") / hot_rows).cast("int").alias("__k"),
    )
    salted = df.join(hot, list(group_cols), "left")
    k = F.coalesce(F.col("__k"), F.lit(1))
    s = F.pmod(F.xxhash64(id_col), k).cast("int")
    pairs = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda j: F.struct(
            F.least(s, j).cast("int").alias("lo"),
            F.greatest(s, j).cast("int").alias("hi"),
        ),
    )
    return (
        salted.withColumn("salt", s)
        .withColumn("__sp", F.explode(pairs))
        .withColumn("lo", F.col("__sp.lo"))
        .withColumn("hi", F.col("__sp.hi"))
        .drop("__sp", "__k")
    )


def salted_apply_pairs(
    df: DataFrame,
    group_cols: tuple[str, ...],
    id_col: str,
    hot_rows: int,
    kernel,
    schema: str,
) -> DataFrame:
    """salted_pair_groups + groupBy + applyInPandas with the exactness
    contract ENFORCED by construction (code-review r9: a salt-unaware
    kernel grouping on (group_cols, lo, hi) double-emits every
    equal-salt pair k times, and nothing but a docstring stopped it).

    `kernel(pdf, pair_keep)` is a driver-built closure receiving, per
    Arrow group, the frame AND a ready-made pair filter:
    ``pair_keep(i_idx, j_idx) -> bool array`` over positional index
    pairs INTO pdf (after any reordering, pass the original positions,
    e.g. ``pair_keep(order[ii], order[jj])``). On a cross group
    (lo != hi) it admits only different-salt pairs; on diagonal or cold
    groups it admits everything — the caller cannot forget the rule
    because the rule is not in the caller.

    The wrapper (make_group_runner) is a CLOSURE built at driver time,
    so cloudpickle ships it — and the captured kernel — by value;
    executors never import this package (the non-repo-cwd driver-sim
    contract).
    """
    return (
        salted_pair_groups(df, group_cols, id_col, hot_rows)
        .groupBy(*group_cols, "lo", "hi")
        .applyInPandas(make_group_runner(kernel), schema)
    )


def make_group_runner(kernel):
    """The per-group executor wrapper salted_apply_pairs ships: builds
    the pair_keep filter from the frame's (lo, hi, salt) columns and
    hands it to the kernel. Exposed as a factory (returning a closure —
    by-value pickling) so tests can drive a kernel exactly as the
    production wrapper does, including legacy salt-free frames (no
    lo/hi columns -> admit-all filter)."""
    import numpy as _np

    def run_group(pdf):
        if (
            len(pdf)
            and "lo" in pdf.columns
            and pdf["lo"].iat[0] != pdf["hi"].iat[0]
        ):
            salts = pdf["salt"].to_numpy()

            def pair_keep(i_idx, j_idx):
                return salts[i_idx] != salts[j_idx]

        else:

            def pair_keep(i_idx, j_idx):
                return _np.ones(len(i_idx), dtype=bool)

        return kernel(pdf, pair_keep)

    return run_group
