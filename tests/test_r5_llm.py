"""Semantic and plan-shape tests for the round-5 ML-adjacent batch
(plans/q_r5_llm.py). Oracle parity at sf0.01 is covered by
test_parity.py's registry sweep; these tests pin the claims the
docstrings make beyond value equality: reference-math checks against
independent numpy implementations, verdict margins, pruning soundness,
and the advertised plan shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all
from eprints_to_hyku_data_tool_spark.sources.tables import load_table

_load_all()


def _plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------- q22 ----
def test_gram_matrix_matches_numpy(spark, sf_dir):
    """The distributed int-partial Gram must equal a single-machine numpy
    X^T X on the SAME 6dp-quantized values, bit for bit."""
    rows = REGISTRY["z138322_gram_matrix"].fn(spark, sf_dir).collect()
    emb = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    # Same quantization: round-half-away-from-zero at 6dp.
    q = np.copysign(np.floor(np.abs(emb * 1e6) + 0.5), emb).astype(np.int64)
    ref = (q.T @ q).astype(np.float64) / 1e12
    assert len(rows) == emb.shape[1] * (emb.shape[1] + 1) // 2
    for r in rows:
        assert r["gram"] == ref[r["i"], r["j"]], (r, ref[r["i"], r["j"]])


def test_gram_matrix_plan_is_one_pass(spark, sf_dir):
    """One corpus scan, Arrow-batched map stage, one partial-agg shuffle
    keyed (i, j) — no joins, no collects."""
    p = _plan_text(REGISTRY["z138322_gram_matrix"].fn(spark, sf_dir))
    assert "MapInPandas" in p, p
    assert "Join" not in p, p
    assert "partial_sum" in p or "HashAggregate" in p, p


# ---------------------------------------------------------------- q23 ----
def test_pq_recall_margin(spark, sf_dir):
    """The registered verdict asserts recall@5 >= 0.8; the measured value
    must clear it with margin (0.9+ at both fixture scales when tuned —
    a fixture drift that erodes the margin should fail HERE, not in a
    driver round)."""
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.plans.q_north import (
        z11661_topk_similarity,
    )
    from eprints_to_hyku_data_tool_spark.plans.q_r5_llm import pq_topk_approx

    exact = z11661_topk_similarity(spark, sf_dir).select(
        "probe_id", "neighbor_id"
    )
    approx = pq_topk_approx(spark, sf_dir).withColumn("hit", F.lit(1))
    row = (
        exact.join(approx, ["probe_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("h"),
        )
        .collect()[0]
    )
    assert row["h"] / row["n"] >= 0.9, (row["h"], row["n"])


def test_pq_shortlist_is_bounded_before_rerank(spark, sf_dir):
    """The ADC map stage emits per-partition shortlists and the rerank
    join touches only shortlist x probes rows — the plan must show the
    WindowGroupLimit cutting candidates before the rerank join."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_llm import pq_topk_approx

    p = _plan_text(pq_topk_approx(spark, sf_dir))
    assert "MapInPandas" in p, p
    assert "WindowGroupLimit" in p, p


# ---------------------------------------------------------------- q24 ----
def test_naive_bayes_confusion_covers_all_test_docs(spark, sf_dir):
    """Every odd-doc_id document gets exactly one prediction: confusion
    matrix counts must sum to the test-split size, and row sums must
    match the per-lang test counts."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    test_counts = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("doc_id") % 2 == 1)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cm = REGISTRY["z118324_naive_bayes"].fn(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in cm) == sum(test_counts.values())
    per_true: dict[str, int] = {}
    for r in cm:
        per_true[r["lang_true"]] = per_true.get(r["lang_true"], 0) + r["n_docs"]
    assert per_true == test_counts


# ---------------------------------------------------------------- q25 ----
def test_knn_prediction_matches_local_vote(spark, sf_dir):
    """The distributed vote must equal a local majority vote over the
    same exact top-5 neighbor lists."""
    from eprints_to_hyku_data_tool_spark.plans.q_north import (
        z11661_topk_similarity,
    )

    emb = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    nbrs: dict[int, list[int]] = {}
    for r in z11661_topk_similarity(spark, sf_dir).collect():
        nbrs.setdefault(r["probe_id"], []).append(emb[r["neighbor_id"]])
    got = {
        r["probe_id"]: (r["label_pred"], r["n_votes"])
        for r in REGISTRY["z138325_knn_classifier"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(nbrs)
    for pid, labels in nbrs.items():
        counts: dict[int, int] = {}
        for lb in labels:
            counts[lb] = counts.get(lb, 0) + 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[pid] == best, (pid, got[pid], best)


# ---------------------------------------------------------------- q26 ----
def test_bfs_matches_local_reference(spark, sf_dir):
    """Distributed BFS hop counts must equal a driver-side BFS over the
    identical edge set (collected once, test-only)."""
    from eprints_to_hyku_data_tool_spark.plans.q_analytics import (
        _copurchase_edges,
    )

    adj: dict[int, set[int]] = {}
    for r in _copurchase_edges(spark, sf_dir).collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    seeds = sorted(adj.keys())[:10]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for hop in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    got = {
        r["node"]: r["hop"]
        for r in REGISTRY["z117526_bfs_hops"].fn(spark, sf_dir).collect()
    }
    assert got == dist


def test_bfs_plan_has_no_unbounded_collect(spark, sf_dir, monkeypatch):
    """Plan construction must not collect anything — the loop is pure
    DataFrame composition (the q88 discipline)."""
    from pyspark.sql import DataFrame

    calls: list[int] = []
    real = DataFrame.collect

    def spy(self):
        rows = real(self)
        calls.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    REGISTRY["z117526_bfs_hops"].fn(spark, sf_dir)
    assert calls == []


# ---------------------------------------------------------------- q27 ----
def test_psi_zero_under_no_drift(spark, sf_dir):
    """PSI's defining property: identical distributions give zero drift.
    Feed the SAME slice as both sides via a synthetic frame."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "bin": [0, 1, 2],
            "n_ref": [100, 200, 300],
            "n_cur": [100, 200, 300],
        }
    )
    df = spark.createDataFrame(pdf)
    tot = 600
    p_cur = F.col("n_cur").cast("double") / F.lit(float(tot))
    p_ref = F.col("n_ref").cast("double") / F.lit(float(tot))
    ratio = (F.col("n_cur") * F.lit(tot)).cast("double") / (
        F.col("n_ref") * F.lit(tot)
    ).cast("double")
    out = df.select(
        F.round((p_cur - p_ref) * F.log(ratio), 6).alias("psi")
    ).collect()
    assert all(r["psi"] == 0.0 for r in out)


def test_psi_bins_cover_all_events(spark, sf_dir):
    """The fixed-width bins with a LEAST clamp must account for every
    event row in every bin present on BOTH sides (documented inner-join
    semantics: PSI is undefined for one-sided bins, which are excluded;
    everything else must be fully counted — no silent drops)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"),
               "ref").otherwise("cur").alias("side"),
        F.least(F.floor(F.col("value") / 50.0).cast("int"),
                F.lit(9)).alias("bin"),
    )
    per = {
        (r["side"], r["bin"]): r["n"]
        for r in ev.groupBy("side", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    both = {b for s, b in per if ("ref", b) in per and ("cur", b) in per}
    expected = sum(n for (s, b), n in per.items() if b in both)
    rows = REGISTRY["z138327_psi_drift"].fn(spark, sf_dir).collect()
    assert {r["bin"] for r in rows} == both
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == expected


# ---------------------------------------------------------------- q28 ----
def test_zonemap_decisions_are_sound(spark, sf_dir):
    """can_skip may NEVER be true for a partition that contains a
    matching row — for either predicate class."""
    rows = REGISTRY["z138328_zonemap_skipping"].fn(spark, sf_dir).collect()
    for r in rows:
        if r["price_can_skip"]:
            assert r["n_price_match"] == 0, r
        if r["date_can_skip"]:
            assert r["n_date_match"] == 0, r
    # The layout lesson itself: the partitioning column prunes, the
    # uncorrelated one doesn't.
    assert any(r["date_can_skip"] for r in rows)
    assert not any(r["price_can_skip"] for r in rows)


def test_zonemap_is_single_scan(spark, sf_dir):
    p = _plan_text(REGISTRY["z138328_zonemap_skipping"].fn(spark, sf_dir))
    assert p.count("Location: InMemoryFileIndex") <= 2, p
    assert "Join" not in p, p
