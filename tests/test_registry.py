"""Registry loader behavior (VERDICT r1 item 7): a missing plan module is
tolerated (incremental build), but a BROKEN module must fail loudly — a
silently-skipped module would shrink queries() and let the correctness
gate pass vacuously."""

from __future__ import annotations

import builtins
import sys

import pytest

from eprints_to_hyku_data_tool_spark.plans import registry


def _run_load_with_fake_import(monkeypatch, effect):
    """Route the import of one phantom plan module through `effect`."""
    phantom = f"{registry.__package__}.q_joins"
    real_import = builtins.__import__

    def fake_import(name, *args, **kwargs):
        if name == phantom:
            return effect(name)
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    monkeypatch.delitem(sys.modules, phantom, raising=False)
    registry._load_all()


def test_missing_module_tolerated(monkeypatch):
    def missing(name):
        raise ModuleNotFoundError(f"No module named '{name}'", name=name)

    _run_load_with_fake_import(monkeypatch, missing)  # no raise


def test_broken_internal_import_propagates(monkeypatch):
    def broken(name):
        # the module EXISTS but an import inside it is broken
        raise ModuleNotFoundError(
            "No module named 'numpyy'", name="numpyy"
        )

    with pytest.raises(ModuleNotFoundError, match="numpyy"):
        _run_load_with_fake_import(monkeypatch, broken)


def test_priority_tier_fits_driver_window():
    """The driver verifies only the first 50 sorted names (round-2 finding).
    Every q*/x* query must land inside that window (<= 50 priority names);
    y-tier = overflow added after the window filled (rotation candidates);
    z-tier = queries an earlier round's driver verified green. Both stay
    oracle-checked by the local parity mirror. Unfilled window slots fall
    to y/z names, which simply get re-verified — never wasted."""
    registry._load_all()
    names = sorted(registry.REGISTRY)
    window = set(names[:50])
    priority = {n for n in names if n[0] not in "yz"}
    assert priority <= window, sorted(priority - window)
    assert len(priority) <= 50, len(priority)
    for n in names:
        assert n[0] in "qxyz", n


# SURVEY.md §2 component -> the registered query that carries it today
# (tier rotations rename queries between rounds; this map is the single
# place that must stay current, and it guards against a rotation silently
# dropping a §2 component from the registry). None = no SQL oracle is
# possible by design; the component is covered by the named test module
# instead of a registered query.
SECTION2_MAP = {
    "Q01": "z01_scan_count", "Q02": "z02_scan_pushdown",
    "Q03": "z03_project_compute", "Q04": "z04_compound_predicate",
    "Q05": "z05_in_like_null", "Q06": "z06_distinct",
    "Q07": "z07_case_when", "Q08": "z08_inner_join",
    "Q09": "z09_broadcast_join", "Q10": "z10_left_outer_join",
    "Q11": "z11_full_outer_join", "Q12": "z12_semi_join",
    "Q13": "z13_anti_join", "Q14": "z14_cross_join",
    "Q15": "z15_range_join", "Q16": "z16_asof_join",
    "Q17": "z17_self_join_pairs", "Q18": "z18_similarity_join",
    "Q19": "z19_groupby_multi_agg", "Q20": "z20_global_agg",
    "Q21": "z21_count_distinct", "Q22": "z22_approx_count_distinct",
    "Q23": "z23_rollup", "Q24": "z24_cube", "Q25": "z25_bulkrax_fold",
    "Q26": "z26_pivot", "Q27": "z27_percentiles", "Q28": "z28_stats",
    "Q29": "z29_conditional_agg", "Q30": "z30_mixed_distinct",
    "Q31": "z31_keepfirst_dedupe", "Q32": "z32_topk_per_group",
    "Q33": "z33_lag_lead", "Q34": "z34_running_sum",
    "Q35": "z35_range_frame", "Q36": "z36_ntile_first_last",
    "Q37": "z37_multikey_sort", "Q38": "z38_global_topk",
    "Q39": "z39_limit_offset", "Q40": "z40_union",
    "Q41": "z41_intersect", "Q42": "z42_except",
    "Q43": "z43_string_kit", "Q44": "z44_regex_extract",
    "Q45": "z45_fuzzy_match", "Q46": "z46_date_kit",
    "Q47": "z47_math_kit", "Q48": "z48_array_kit",
    "Q49": "z49_map_kit", "Q50": "z50_json_kit",
    "Q51": "z51_hash_ids", "Q52": "z52_null_kit",
    "Q53": "z53_cast_kit", "Q54": "z54_tumbling_window",
    "Q55": "z55_sliding_window", "Q56": "z56_session_window",
    "Q57": "z57_scalar_pandas_udf", "Q58": "z58_grouped_map",
    "Q59": "z59_exact_dedupe", "Q60": "z60_minhash_lsh",
    "Q61": "z61_topk_similarity", "Q62": "z62_text_stats",
    "X01": None,  # CSV/ORC source — tests/test_etl.py
    "X02": None,  # JSON source — tests/test_etl.py
    "X03": None,  # XML (EP3) source — tests/test_etl.py
    "X04": None,  # JDBC source/sink — tests/test_etl.py Derby round-trip
    "X05": None,  # Bulkrax CSV sink — tests/test_etl.py golden files
    "X06": None,  # partitioned parquet sink — tests/test_etl.py
    "X07": None,  # streaming source/sink — tests/test_streaming.py
    "X08": None,  # watermark/late data — tests/test_streaming.py
    "X09": None,  # streaming dedupe — tests/test_streaming.py
    "X10": None,  # stream-static join — tests/test_streaming.py
    "X11": None,  # stateful processing — tests/test_streaming.py
    "X12": "z81_grouped_agg_udaf", "X13": "z82_mapinpandas_shred",
    "X14": "z83_sql_registered_udf", "X15": "z84_tfidf",
}


def test_every_section2_component_registered():
    registry._load_all()
    missing = {
        cid: name
        for cid, name in SECTION2_MAP.items()
        if name is not None and name not in registry.REGISTRY
    }
    assert not missing, f"§2 components with no live registration: {missing}"
    assert len(SECTION2_MAP) == 77


def test_every_query_has_unique_registration():
    registry._load_all()
    names = list(registry.REGISTRY)
    assert len(names) == len(set(names))
    # every oracle-paired entry has non-empty SQL
    for name, spec in registry.REGISTRY.items():
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name


# --------------------------------------------------------------------------
# Rotation bookkeeping (VERDICT r4 item 8): the z-tier claims "an earlier
# round's driver verified this query green under a former name". That claim
# must be mechanically checkable, or a rename could launder an unverified
# query into the verified tier.
# --------------------------------------------------------------------------
import glob
import json
import os
import re

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rename_files() -> list[str]:
    return sorted(
        glob.glob(os.path.join(_ROOT, "RENAMES_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )


def _green_driver_names() -> set[str]:
    """Names with a fully-green row (rows+schema+hash) in any round's
    driver CORRECTNESS artifact."""
    green: set[str] = set()
    for f in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            ):
                green.add(name)
    return green


def test_rename_maps_are_injective_and_acyclic():
    """Each RENAMES_r*.json must be a clean old->new map: no old name
    renamed twice within a file (dict guarantees that), no two old names
    collapsing onto one new name, no self-renames, and walking the
    composed new->old chain from any current name must terminate (no
    rename cycles across rounds)."""
    registry._load_all()
    inverses = []
    for f in _rename_files():
        m = json.load(open(f))
        assert len(set(m.values())) == len(m), f"{f}: duplicate targets"
        assert all(k != v for k, v in m.items()), f"{f}: self-rename"
        inverses.append({v: k for k, v in m.items()})
    for name in registry.REGISTRY:
        seen = {name}
        cand = name
        # newest-first: each round's inverse applies at most once
        for inv in reversed(inverses):
            nxt = inv.get(cand, cand)
            if nxt != cand:
                assert nxt not in seen, f"rename cycle through {nxt}"
                seen.add(nxt)
                cand = nxt


def test_every_z_name_has_green_driver_ancestor():
    """Every z-tier query must trace back through the RENAMES chain to a
    name the driver verified fully green in some round. A z-name that
    cannot is an unverified query hiding in the verified tier and must
    stay in the q/x window instead. (The round-3 rotation's same-suffix
    renames were backfilled into RENAMES_r3.json in round 6 from the
    CORRECTNESS_r01/r02 green rows, so the chain is fully
    machine-checkable — no prose exceptions.)"""
    registry._load_all()
    green = _green_driver_names()
    inverses = [
        {v: k for k, v in json.load(open(f)).items()}
        for f in reversed(_rename_files())
    ]
    orphans = {}
    for name in registry.REGISTRY:
        if not name.startswith("z"):
            continue
        cand, found = name, name in green
        if not found:
            for inv in inverses:
                cand = inv.get(cand, cand)
                if cand in green:
                    found = True
                    break
        if not found:
            orphans[name] = cand
    assert not orphans, f"z-names with no green driver ancestor: {orphans}"
