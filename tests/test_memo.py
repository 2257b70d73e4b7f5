"""Unit tests for the session-scoped materialization memo.

Uses stub sessions (only .sparkContext.applicationId is consulted) and a
stubbed-out materialize so no JVM is needed: what's under test is the
keying and lifecycle policy, not Spark itself — same-key reuse,
cross-sf_dir isolation, and the round-6 review fix that entries keyed to
STOPPED applications are evicted on access instead of leaking forever in
a process that cycles SparkSessions.
"""

from __future__ import annotations

import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eprints_to_hyku_data_tool_spark.functions import memo as memo_mod


def _fake_spark(app_id: str):
    return SimpleNamespace(sparkContext=SimpleNamespace(applicationId=app_id))


def _with_identity_materialize(monkeypatch):
    # materialize() needs a JVM; the memo's contract is only that it is
    # called once per key with the built value.
    monkeypatch.setattr(memo_mod, "materialize", lambda df: df)


def test_same_key_builds_once(monkeypatch):
    _with_identity_materialize(monkeypatch)
    memo_mod._MEMO.clear()
    spark = _fake_spark("app-1")
    calls = []

    def build():
        calls.append(1)
        return object()

    a = memo_mod.session_memo(spark, "/sf", "k", build)
    b = memo_mod.session_memo(spark, "/sf", "k", build)
    assert a is b and len(calls) == 1


def test_sf_dir_and_key_isolated(monkeypatch):
    _with_identity_materialize(monkeypatch)
    memo_mod._MEMO.clear()
    spark = _fake_spark("app-1")
    a = memo_mod.session_memo(spark, "/sf1", "k", object)
    b = memo_mod.session_memo(spark, "/sf2", "k", object)
    c = memo_mod.session_memo(spark, "/sf1", "k2", object)
    assert a is not b and a is not c and b is not c


def test_stopped_app_entries_evicted(monkeypatch):
    _with_identity_materialize(monkeypatch)
    memo_mod._MEMO.clear()
    old = _fake_spark("app-old")
    memo_mod.session_memo(old, "/sf", "k1", object)
    memo_mod.session_memo(old, "/sf", "k2", object)
    assert len(memo_mod._MEMO) == 2
    new = _fake_spark("app-new")
    fresh = memo_mod.session_memo(new, "/sf", "k1", object)
    # The two app-old entries are gone; only the new app's entry lives.
    assert set(memo_mod._MEMO) == {("app-new", "/sf", "k1")}
    assert memo_mod._MEMO[("app-new", "/sf", "k1")] is fresh
    memo_mod._MEMO.clear()
