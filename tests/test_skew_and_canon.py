"""Salted-join equivalence + parity-canonicalizer edge cases (the ADVICE
r1 defects stay fixed)."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pandas as pd
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.functions.skew import salted_join, top_heavy_keys
from eprints_to_hyku_data_tool_spark.sources.tables import load_table

from .parity import canon_value


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_key"), "c_mktsegment")
    )
    plain = events.join(
        dim, events.user_id == dim.user_key, "inner"
    ).select("event_id", "c_mktsegment")
    salted = salted_join(events, dim, "user_id", "user_key", n_salts=8).select(
        "event_id", "c_mktsegment"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_accepts_spark_mode_aliases(spark):
    """Spark's 'semi'/'anti' aliases are large-side-preserving and must
    pass the mode allowlist; right/full stay rejected (ADVICE r12)."""
    import pytest

    large = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1,)], "sk long")
    assert (
        salted_join(large, small, "k", "sk", n_salts=2, how="semi").count()
        == 1
    )
    assert (
        salted_join(large, small, "k", "sk", n_salts=2, how="anti").count()
        == 1
    )
    with pytest.raises(ValueError, match="preserves replicated"):
        salted_join(large, small, "k", "sk", how="right")


def test_salted_join_rejects_salt_column_clash(spark):
    """code-review r15 (the salted_pair_groups guard applied to its
    sibling): an input already carrying __salt would be silently
    overwritten, and the final drop(SALT_COL) removes EVERY column of
    that name — the caller's data vanishes from the result with no
    error. Loud on either side instead."""
    import pytest

    large = spark.createDataFrame(
        [(1, 9)], "k long, __salt long"
    )
    small = spark.createDataFrame([(1,)], "sk long")
    with pytest.raises(ValueError, match="large.*__salt"):
        salted_join(large, small, "k", "sk")
    with pytest.raises(ValueError, match="small.*__salt"):
        salted_join(
            small.select(F.col("sk").alias("k")),
            large.select(F.col("k").alias("sk"), "__salt"),
            "k",
            "sk",
        )


def test_top_heavy_keys_shape(spark, sf_dir):
    out = top_heavy_keys(load_table(spark, sf_dir, "events"), "user_id", 3)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["n_rows"] >= rows[1]["n_rows"] >= rows[2]["n_rows"]
    assert 0 < rows[0]["share"] < 1


# ---- canon_value edge cases (ADVICE r1 items must stay fixed) ----


def test_canon_decimal_exact_above_2_53():
    a, b = Decimal(2**60), Decimal(2**60 + 1)
    assert canon_value(a) != canon_value(b)  # float folding would collapse


def test_canon_decimal_trailing_zeros():
    assert canon_value(Decimal("1.10")) == canon_value(Decimal("1.1"))
    # Tagged since r14: the untagged token collided with a double's
    # shortest repr (half-ulp-lax compare) and with the int token.
    assert canon_value(Decimal("100")) == "d:100"
    assert canon_value(Decimal("100")) != canon_value(100)
    assert canon_value(Decimal("0.1")) != canon_value(0.1)


def test_canon_container_tags_do_not_collide():
    """code-review r14: pyspark Row subclasses tuple — untagged, a
    STRUCT(1,2) and an ARRAY [1,2] canonicalized identically (false
    GREEN); DuckDB maps arrive as key-value tuple lists while Spark maps
    are dicts (false RED). One keyed kv-form + an a: array tag."""
    from pyspark.sql import Row

    assert canon_value([1, 2]) == "a:[1,2]"
    assert canon_value(Row(a=1, b=2)) != canon_value([1, 2])
    assert canon_value(Row(a=1, b=2)) == canon_value({"a": 1, "b": 2})
    # Arrow MAP shape (list of 2-tuples) == Spark map dict shape
    assert canon_value([(1, "x"), (2, "y")]) == canon_value(
        {1: "x", 2: "y"}
    )
    # ...but an array of 2-element LISTS is an array, not a map
    assert canon_value([[1, 2]]) == "a:[a:[1,2]]"


def test_canon_nat_and_none_agree():
    assert canon_value(pd.NaT) == canon_value(None) == "NULL"


def test_canon_negative_zero_folds():
    assert canon_value(-0.0) == canon_value(0.0) == "0.0"


def test_canon_datetime_vs_timestamp_agree():
    d = datetime.datetime(2024, 1, 1, 0, 0, 7, 179575)
    assert canon_value(d) == canon_value(pd.Timestamp(d))


def test_canon_decimal_wide_precision_not_rounded():
    """code-review r15: Decimal.normalize() rounds to the ambient context
    precision (28), so two DECIMAL(38)s agreeing in the first 28 digits
    emitted the SAME token — a false GREEN on the wide decimals DuckDB
    returns for SUM(BIGINT). The string-form strip is exact."""
    a = Decimal("12345678901234567890123456789012345678")
    b = Decimal("12345678901234567890123456789012345679")
    assert canon_value(a) != canon_value(b)
    assert canon_value(a) == "d:12345678901234567890123456789012345678"
    # fractional wide values stay exact too
    assert canon_value(Decimal("0." + "1" * 38)) != canon_value(
        Decimal("0." + "1" * 37 + "2")
    )
    # and the zero-strip semantics survive the rewrite
    assert canon_value(Decimal("-0.000")) == canon_value(Decimal("0")) == "d:0"
    assert canon_value(Decimal("1E+3")) == "d:1000"


def test_canon_map_with_unhashable_keys():
    """code-review r15: array-/struct-keyed maps are legal in both
    engines; Arrow surfaces them as (key, value) 2-tuples whose keys are
    unhashable lists — dict(vals) crashed the gate on IDENTICAL results
    (false crash-RED). Pairs are canonicalized directly."""
    assert canon_value([([1, 2], 5)]) == "kv:{a:[1,2]=5}"
    assert canon_value([([1, 2], 5)]) != canon_value([([1, 3], 5)])
    # dict-shaped and tuple-list-shaped maps still sort entries by the
    # SAME key (the canonical key token), whatever the raw key order
    assert canon_value([(10, "x"), (9, "y")]) == canon_value(
        {9: "y", 10: "x"}
    )


def test_driver_canon_probe_catches_single_row_complex_cells(spark, duck):
    """code-review r15: sort_values compares nothing on a 1-row frame,
    so the driver-canon probe was vacuous exactly where a complex cell
    could hide; and pandas raises ValueError (not TypeError) on the
    single-by-column ndarray path, escaping the old narrow except. Both
    arms must now fail as the diagnostic AssertionError."""
    import pytest as _pytest

    from .parity import assert_parity

    one = spark.sql("SELECT array(1, 2) AS xs")
    with _pytest.raises(AssertionError, match="driver-canonicalizable"):
        assert_parity(one, "SELECT [1, 2] AS xs", duck, name="probe1")
    two = spark.sql("SELECT array(1, 2) AS xs UNION ALL SELECT array(3, 4)")
    with _pytest.raises(AssertionError, match="driver-canonicalizable"):
        assert_parity(
            two,
            "SELECT [1, 2] AS xs UNION ALL SELECT [3, 4]",
            duck,
            name="probe2",
        )


def test_salted_pair_groups_rejects_reserved_columns(spark):
    """salted_pair_groups adds salt/lo/hi (and internals); an input
    already carrying one would be silently overwritten and the
    downstream pair filter would read the wrong salt — rejected loudly
    instead (code-review r10)."""
    import pytest

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        salted_pair_groups,
    )

    df = spark.createDataFrame(
        [(1, 0, 0)], "vec_id long, cell int, salt int"
    )
    with pytest.raises(ValueError, match="salt"):
        salted_pair_groups(df, ("cell",), "vec_id", 8)


def test_make_group_runner_supplies_pair_filter():
    """The exactness rule lives in the wrapper, not the kernel: a
    kernel that emits every index pair it is HANDED still produces the
    cross-group/diagonal semantics, because pair_keep filters for it."""
    import numpy as np
    import pandas as pd

    from eprints_to_hyku_data_tool_spark.functions.skew import (
        make_group_runner,
    )

    def naive_kernel(pdf, pair_keep):
        n = len(pdf)
        ii, jj = np.triu_indices(n, k=1)
        m = pair_keep(ii, jj)
        return pd.DataFrame({"i": ii[m], "j": jj[m]})

    run = make_group_runner(naive_kernel)
    base = {"salt": [0, 0, 1], "vec_id": [1, 2, 3]}
    cross = run(pd.DataFrame({**base, "lo": 0, "hi": 1}))
    assert set(zip(cross["i"], cross["j"])) == {(0, 2), (1, 2)}
    diag = run(pd.DataFrame({**base, "lo": 0, "hi": 0}))
    assert set(zip(diag["i"], diag["j"])) == {(0, 1), (0, 2), (1, 2)}
    legacy = run(pd.DataFrame({"vec_id": [1, 2, 3]}))
    assert len(legacy) == 3


def test_driver_canon_probe_catches_single_row_map_cells(spark, duck):
    """code-review r15 (second pass): Arrow surfaces MAP columns to
    pandas as lists of (k, v) tuples — a `list`, which the first
    explicit-cell check missed, reopening the size-dependent vacuity
    for maps specifically."""
    import pytest as _pytest

    from .parity import assert_parity

    one = spark.sql("SELECT map('a', 1) AS m, 1 AS k")
    with _pytest.raises(AssertionError, match="driver-canonicalizable"):
        assert_parity(
            one, "SELECT MAP(['a'], [1]) AS m, 1 AS k", duck, name="probe_map"
        )
