"""Tests for tools/rplsh_exponent.py (VERDICT r8 item 6) and the
committed RPLSH_EXPONENT.json artifact.

The tool's Spark path is exercised by the round-9 measurement run that
produced the artifact; here we pin (a) the fit math on synthetic
power laws, and (b) the artifact's internal consistency — the
scale-constant candidate rate IS the refutation of the n^1.66 label,
so a future re-run that silently changed tiers or banding must keep
the recorded rate/exponent story coherent.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from tools.rplsh_exponent import _fit_slope  # noqa: E402

_ARTIFACT = os.path.join(_ROOT, "RPLSH_EXPONENT.json")


@pytest.mark.parametrize("exp", [1.0, 1.66, 2.0])
def test_fit_slope_recovers_power_law(exp):
    ns = [2000.0, 6000.0, 20000.0]
    ys = [3.7 * n**exp for n in ns]
    assert abs(_fit_slope(ns, ys) - exp) < 1e-9


def test_fit_slope_exact_on_two_points():
    # slope = log(y2/y1)/log(x2/x1)
    assert abs(_fit_slope([10.0, 1000.0], [1.0, 100.0]) - 1.0) < 1e-12


def test_artifact_exists_and_is_internally_consistent():
    with open(_ARTIFACT) as fh:
        rep = json.load(fh)
    tiers = rep["tiers"]
    assert len(tiers) >= 3
    ns = [t["n"] for t in tiers]
    assert ns == sorted(ns) and ns[0] < ns[-1]

    # The recorded exponent must match a re-fit of the recorded counts.
    refit = _fit_slope(ns, [t["cand_distinct"] for t in tiers])
    assert abs(refit - rep["candidate_exponent_distinct"]) < 0.005

    # The rate column must equal cand_distinct / C(n, 2) per tier.
    for t in tiers:
        all_pairs = t["n"] * (t["n"] - 1) / 2
        assert t["cand_rate_of_all_pairs"] == pytest.approx(
            t["cand_distinct"] / all_pairs, abs=5e-5
        )

    # The refutation story: the rate is scale-constant (within 2% rel),
    # hence the exponent is ~2 — NOT the 1.66 the pre-r9 docstring
    # claimed — and sits above the 16/2^8 random-collision floor of the
    # 16x8 banding (real near-dup mass adds to the floor).
    rates = [t["cand_rate_of_all_pairs"] for t in tiers]
    assert max(rates) / min(rates) < 1.02
    assert rep["candidate_exponent_distinct"] == pytest.approx(2.0, abs=0.05)
    assert min(rates) > 16 / 2**8


def test_artifact_per_band_never_below_distinct():
    # A pair colliding in b bands is counted b times in the per-band sum
    # and once in the distinct count.
    with open(_ARTIFACT) as fh:
        rep = json.load(fh)
    for t in rep["tiers"]:
        assert t["cand_per_band"] >= t["cand_distinct"]
