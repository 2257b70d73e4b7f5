"""The shared memoized per-doc 8-gram table (functions/grams.py, r12):
q11775_decontaminate and q128301_duplicate_ngram_filter must both ride ONE
materialized (doc_id, grams) build, and riding it must not change what
either query returns (the build is plan-side only — oracles untouched)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.functions.grams import (
    doc_grams8,
    grams_plan,
)
from eprints_to_hyku_data_tool_spark.sources.tables import load_table


def test_doc_grams8_is_memoized(spark, sf_dir):
    a = doc_grams8(spark, sf_dir)
    b = doc_grams8(spark, sf_dir)
    assert a is b


def test_doc_grams8_matches_unshared_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fresh = grams_plan(docs).select(
        "doc_id", F.explode_outer("grams").alias("gram")
    )
    memoized = doc_grams8(spark, sf_dir).select(
        "doc_id", F.explode_outer("grams").alias("gram")
    )
    assert fresh.exceptAll(memoized).count() == 0
    assert memoized.exceptAll(fresh).count() == 0


def test_consumers_share_the_build(spark, sf_dir, monkeypatch):
    """Both consumers must go through the accessor (a rename or refactor
    that quietly rebuilds the subtree per-query would resurrect the
    18.1x cold smoke ratio)."""
    import eprints_to_hyku_data_tool_spark.functions.grams as grams_mod
    from eprints_to_hyku_data_tool_spark.plans.q_corpus import (
        q11775_decontaminate,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_r4 import (
        q128301_duplicate_ngram_filter,
    )

    calls = []
    real = grams_mod.doc_grams8

    def spy(spark_, sf_dir_):
        calls.append(sf_dir_)
        return real(spark_, sf_dir_)

    monkeypatch.setattr(grams_mod, "doc_grams8", spy)
    q11775_decontaminate(spark, sf_dir)
    q128301_duplicate_ngram_filter(spark, sf_dir)
    assert len(calls) == 2


def test_grams_plan_splits_once_not_per_shingle(spark, sf_dir):
    """code-review r14: an inline split() inside the shingle transform's
    lambda (CodegenFallback — no common-subexpression elimination) would
    re-split the full text once per shingle start, O(tokens^2) per doc.
    The tokens must survive OPTIMIZATION as their own projection, with
    the lambda slicing a bound attribute — pin it on the optimized plan,
    where CollapseProject would be the rule that silently undid it."""
    from eprints_to_hyku_data_tool_spark.functions.grams import grams_plan
    from eprints_to_hyku_data_tool_spark.sources.tables import load_table

    df = grams_plan(load_table(spark, sf_dir, "documents"))
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "slice(split" not in opt, opt
    assert opt.count("split(") == 1, opt
