"""Unit tests for round-5 batch E internals.

The BPE merge engine (q43) rests on a subtle claim: a literal string
replace over the normalized spacing scheme (' s1  s2  s3 ') implements
GREEDY LEFT-TO-RIGHT NON-OVERLAPPING pair merging identically in Spark
and DuckDB. The sf0.01/0.1 parity suite proves the two engines agree on
fixture data; this module proves both agree with a direct Python
reference implementation on the adversarial shapes the fixture may
never produce (odd/even runs of a self-pair, matches at the ends,
merged-symbol adjacency)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


def ref_greedy_merge(tokens: list[str], p1: str, p2: str) -> list[str]:
    """Textbook BPE single-pair merge: scan left to right, merge
    non-overlapping (p1, p2) adjacencies."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == p1 and tokens[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def spaced(tokens: list[str]) -> str:
    return " " + "  ".join(tokens) + " "


CASES = [
    # (tokens, p1, p2) — the adversarial shapes
    (["a", "a", "a"], "a", "a"),          # odd self-run -> [aa, a]
    (["a", "a", "a", "a"], "a", "a"),     # even self-run -> [aa, aa]
    (["a", "a", "a", "a", "a"], "a", "a"),
    (["a", "b"], "a", "b"),               # whole word is the pair
    (["a", "b", "b"], "a", "b"),          # merged symbol then p2 again
    (["c", "a", "b"], "a", "b"),          # pair at the end
    (["a", "b", "a", "b"], "a", "b"),     # back-to-back pairs
    (["a", "b", "c", "a", "b"], "a", "b"),
    (["ab", "c"], "b", "c"),              # p1 is a SUFFIX of a token: no match
    (["a", "bc"], "a", "b"),              # p2 is a PREFIX of a token: no match
    (["x"], "a", "b"),                    # single token
    (["aa", "a"], "a", "a"),              # merged-looking token vs raw pair
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _merge_sql(p1: str, p2: str) -> str:
    pat = f" {p1}  {p2} "
    rep = f" {p1}{p2} "
    return pat, rep


@pytest.mark.parametrize("tokens,p1,p2", CASES)
def test_bpe_replace_merge_matches_reference(spark, duck, tokens, p1, p2):
    expected = ref_greedy_merge(tokens, p1, p2)
    s = spaced(tokens)
    pat, rep = _merge_sql(p1, p2)

    # Spark replace
    got_spark = (
        spark.range(1)
        .select(
            F.split(
                F.trim(F.expr(f"replace('{s}', '{pat}', '{rep}')")), "  "
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    # DuckDB replace
    got_duck = duck.execute(
        "SELECT string_split(trim(replace(?, ?, ?)), '  ')", [s, pat, rep]
    ).fetchone()[0]

    assert got_spark == expected, (tokens, p1, p2, got_spark)
    assert list(got_duck) == expected, (tokens, p1, p2, got_duck)


def test_bpe_spacing_stays_normalized_after_merge(spark):
    """After any replace, every token must still be recoverable by the
    trim + double-space split the next round uses — i.e. the spacing
    invariant (one space at ends, two between tokens) is preserved."""
    s = spaced(["a", "a", "a", "a", "b"])
    pat, rep = _merge_sql("a", "a")
    merged = (
        spark.range(1)
        .select(F.expr(f"replace('{s}', '{pat}', '{rep}')").alias("s"))
        .collect()[0]["s"]
    )
    toks = merged.strip().split("  ")
    assert toks == ["aa", "aa", "b"], merged
    # round-trips through the same renderer
    assert merged == spaced(toks), merged


def test_reconcile_count_identities(spark, sf_dir):
    """The reconciliation verdict must satisfy the partition identities:
    source = match + mismatch + missing, target = match + mismatch +
    extra — nothing double-counted, nothing dropped."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_pipeline import (
        q9349_reconcile,
    )

    row = q9349_reconcile(spark, sf_dir).collect()[0]
    assert (
        row.n_source
        == row.n_match + row.n_value_mismatch + row.n_missing_in_target
    ), row
    assert (
        row.n_target
        == row.n_match + row.n_value_mismatch + row.n_extra_in_target
    ), row
    assert row.n_missing_in_target > 0, row  # the %97 drop is visible
    assert row.n_value_mismatch > 0, row  # the %101 corruption is visible


def test_ewma_is_bounded_by_observations(spark, sf_dir):
    """EWMA is a convex combination of observations: every user's final
    smoothed value must lie within [min, max] of their own series."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_etl import (
        _events,
        q9336_ewma,
    )

    ew = q9336_ewma(spark, sf_dir)
    bounds = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min("value_u").alias("lo"), F.max("value_u").alias("hi"))
    )
    bad = (
        ew.join(bounds, "user_id")
        .filter(
            (F.col("ewma_u") < F.col("lo") - 1e-6)
            | (F.col("ewma_u") > F.col("hi") + 1e-6)
        )
        .count()
    )
    assert bad == 0


def test_scd2_ranges_partition_the_history(spark, sf_dir):
    """Per user: version numbers are dense from 0, exactly one range is
    current, and the per-version event counts sum to the user's total
    event count — the SCD2 output partitions the history."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_etl import (
        _events,
        z138329_scd2_history,
    )

    scd = z138329_scd2_history(spark, sf_dir)
    agg = scd.groupBy("user_id").agg(
        F.min("version").alias("vmin"),
        F.max("version").alias("vmax"),
        F.count(F.lit(1)).alias("n_ranges"),
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.sum("n_events").alias("n_events"),
    )
    totals = _events(spark, sf_dir).groupBy("user_id").count()
    joined = agg.join(totals, "user_id")
    bad = joined.filter(
        (F.col("vmin") != 1)
        | (F.col("vmax") != F.col("n_ranges"))
        | (F.col("n_current") != 1)
        | (F.col("n_events") != F.col("count"))
    ).count()
    assert bad == 0


# --------------------------------------------------------------------------
# Property sweep: the replace-based merge == the reference greedy merge
# for ARBITRARY token sequences and pairs. DuckDB evaluates each example
# (sub-millisecond); Spark/DuckDB replace equivalence is pinned by the
# crafted cross-engine cases above, so the sweep transfers.
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_sym = st.text(alphabet="abc", min_size=1, max_size=2)


@settings(max_examples=300, deadline=None)
@given(
    tokens=st.lists(_sym, min_size=1, max_size=8),
    p1=_sym,
    p2=_sym,
)
def test_bpe_replace_merge_property(tokens, p1, p2):
    con = duckdb.connect()
    s = spaced(tokens)
    pat, rep = _merge_sql(p1, p2)
    got = con.execute(
        "SELECT string_split(trim(replace(?, ?, ?)), '  ')", [s, pat, rep]
    ).fetchone()[0]
    assert list(got) == ref_greedy_merge(tokens, p1, p2), (tokens, p1, p2)
