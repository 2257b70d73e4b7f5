"""Ledger tables: a minimal transactional table format on parquet.

The engine's MERGE/CDC/SCD2 operators (plans/q_r5_etl.py) give the
RELATIONAL semantics of an incremental migration; what a real 100 TB
EPrints->Hyku cutover additionally needs is those semantics ON STORAGE —
upsert a delta batch into yesterday's snapshot without rewriting 100 TB,
read the table as-of any version, and survive a concurrent writer. That
is the Delta/Iceberg capability class, rebuilt here from first
principles on plain parquet + a JSON manifest ledger, so the engine has
no dependency beyond pyspark itself.

Layout (all paths relative to the table root):

    _ledger/00000000.json       -- create: a full base manifest
    _ledger/00000001.json       -- every later commit: a DELTA manifest
    _ledger/chk-00000010.json   -- full checkpoint every 10th version
    _ledger/_last_checkpoint    -- pointer to the newest checkpoint
    data/<uuid>/                -- one parquet "file group" per write job

The metadata plane is incremental (the Delta-log pattern): a commit
writes only what CHANGED — groups added, group paths removed, the
schema when it widened — so commit cost is O(delta), not O(#groups);
at ~100k groups a full-snapshot manifest would be tens of MB of JSON
per commit, a delta is a few KB. Every CHECKPOINT_INTERVAL versions the
committer also materializes a full checkpoint (groups, schema, and the
accumulated per-app txn high-water map), so resolving the table state
at any version reads one anchor + at most CHECKPOINT_INTERVAL deltas,
and a restarted streaming writer's ``latest_txn`` lookup is O(interval)
instead of O(#versions). Data files are NEVER mutated or deleted by
writes — a commit only adds data and one manifest — so readers need no
locks: a snapshot read resolves one version's state and scans exactly
the groups it lists (time travel = resolve an older version).

Commit protocol (optimistic concurrency): the writer computes its new
version N = latest+1, writes the manifest to a temp name, then
``os.link(tmp, _ledger/N.json)`` — an atomic create-if-absent on POSIX.
Two racing writers both targeting N: exactly one link succeeds, the
loser gets ConcurrentCommitError and must re-read and retry. On a cloud
object store the equivalent is a conditional PUT (if-none-match), which
is how the production formats do it.

MERGE is copy-on-write at file-group granularity — the property that
makes it 100 TB-viable:

  1. the source delta's [min,max] key bounds (one tiny agg) prune the
     manifest's group list DRIVER-SIDE, O(#groups) metadata work;
  2. untouched groups are carried into the new manifest by reference —
     their bytes are never read, shuffled, or rewritten;
  3. only the touched groups join the delta (a key-keyed sort-merge or
     AQE broadcast — no hint, the delta may be any size) and are
     rewritten as one new group.

So a 1 GB delta against a 100 TB table rewrites only the groups whose
key ranges overlap the delta — with date- or id-clustered ingest that is
a few groups, not the table. DELETE WHERE is the same copy-on-write in
TWO jobs regardless of group count: one pushed-down probe scan grouped
by source group finds the matched groups, one staged partitionBy write
rewrites only their survivors (group identity, clustering, and prunable
key ranges preserved). compact() packs all its bins the same one-write
way.

``vacuum`` removes data groups no manifest references (crashed writers'
orphans, and groups released by ``expire_history``; expiry materializes
a checkpoint at the oldest kept version first, so the kept delta chain
stays resolvable). Bounded driver state throughout: commits are
O(delta) JSON, state resolution is one anchor + ≤ CHECKPOINT_INTERVAL
deltas, and no query data ever reaches the driver beyond one
min/max/count row per write.

Beyond the single stats key, tables may declare extra ``stats_cols``
at create: every group then records per-column [min,max] for each, and
``read(between={col: (lo, hi)})`` prunes groups on ANY stats column
before the scan is planned (the Iceberg column-stats capability; the
key remains the merge/clustering column). Stats columns are restricted
to types whose min/max order survives the JSON manifest (integers,
floats, strings, dates, timestamps — date/timestamp are stored as ISO
strings, whose lexicographic order matches chronological order).

Schema evolution (add-column): ``append``/``merge`` with
``merge_schema=True`` accept a source that ADDS nullable columns after
the existing ones (same names/types for every existing column; no
drops, no type changes — the safe evolution subset). The commit
records the widened schema; old file groups are never rewritten —
snapshot reads pass the manifest schema to the parquet scan and the
reader fills the missing columns with NULL, so evolution is a pure
metadata operation (the Delta/Iceberg add-column behavior). Time
travel to a pre-evolution version reads with that version's schema.

``optimize_zorder`` is OPTIMIZE ... ZORDER BY: it rewrites the snapshot
clustered on the Morton interleave of per-column quantile-rank codes
and cuts groups on z-value quantiles, so the per-group envelopes of
EVERY cluster dimension tighten at once and ``between`` pruning works
on all of them (a single-column sort gives one dimension only). One
staged partitionBy write + two column-pruned quantile passes + one
stats agg — no driver loop over buckets, no row data on the driver.

Remaining limitations vs the production formats, declared: no column
drops/renames/type-widening (add-column only), z-order cluster columns
must be numeric/date/timestamp/string (strings use sampled range
boundaries, the RangePartitioner approach), whole-snapshot optimize
(no incremental file selection), POSIX-atomic link (swap for a
conditional PUT off-box), JSON checkpoints. The parquet-checkpoint
swap was ADJUDICATED with a measurement (r14), not just deferred: at
the 100k-group tier a columnar checkpoint loses on time for this
runtime's access pattern — pyarrow build+write 0.44 s vs compact-JSON
dump 0.33 s, and read+rebuild-into-dicts 0.85 s vs json.loads 0.53 s —
because resolution consumes python group dicts, so the decode pays a
column->dict transpose that JSON never does; only the bytes shrink
(6.4 vs 18 MB). Parquet checkpoints pay off when resolution itself
goes columnar (vectorized stat pruning over the group table), which is
the production formats' design and a rewrite, not a swap.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_LEDGER_DIR = "_ledger"
_DATA_DIR = "data"
_STAGING_PREFIX = "tmp-optimize-"

# Every Nth commit also writes a full checkpoint (the Delta
# ``_last_checkpoint`` pattern): commits stay O(delta) JSON regardless
# of group count, and state resolution walks at most this many delta
# manifests back to an anchor.
CHECKPOINT_INTERVAL = 10
_CHECKPOINT_PREFIX = "chk-"
_LAST_CHECKPOINT = "_last_checkpoint"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first: re-read and retry."""


class TxnAlreadyApplied(RuntimeError):
    """The commit's transactional identity (app, batch) is at or below
    the PARENT state's recorded high-water: this exact batch (or a
    newer one) already landed. Raised from INSIDE the optimistic commit
    attempt — atomically with the parent read — so a zombie writer
    whose pre-flight latest_txn check passed before it stalled cannot
    re-apply stale data on top of newer commits (the check-then-act
    hole; code-review r14)."""


class LedgerError(ValueError):
    """Misuse: missing table, schema mismatch, duplicate source keys."""


# --------------------------------------------------------------------------
# Manifest plumbing
# --------------------------------------------------------------------------
def _ledger_path(table: str) -> str:
    return os.path.join(table, _LEDGER_DIR)


def _manifest_name(version: int) -> str:
    return f"{version:08d}.json"


def _versions(table: str) -> list[int]:
    d = _ledger_path(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )


def latest_version(table: str) -> int:
    vs = _versions(table)
    if not vs:
        raise LedgerError(f"not a ledger table (no {_LEDGER_DIR}): {table}")
    return vs[-1]


def _read_raw(table: str, version: int) -> dict:
    """The manifest FILE for `version`, verbatim: a full snapshot for
    ``create`` (and pre-checkpoint-era tables), a delta otherwise."""
    p = os.path.join(_ledger_path(table), _manifest_name(version))
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise LedgerError(f"version {version} does not exist: {table}")


def _checkpoint_name(version: int) -> str:
    return f"{_CHECKPOINT_PREFIX}{version:08d}.json"


def _read_checkpoint(table: str, version: int) -> dict | None:
    p = os.path.join(_ledger_path(table), _checkpoint_name(version))
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


# Resolved-state cache. Manifests are immutable once linked, but a
# table directory can be deleted and recreated at the same path (tests,
# reruns), so the key carries the manifest file's identity (mtime+size)
# — a recreated table misses instead of serving stale state. Bounded in
# BOTH dimensions that matter: entry count AND total cached group
# entries (each state holds its own O(#groups) list — at ~100k groups a
# count-only cap would pin hundreds of MB of driver metadata).
class _ResolveCache(dict):
    """A dict that pickles EMPTY: this module is registered for
    by-value cloudpickling (ledger_stream.py), so a plain module-global
    dict would ship its entire contents — up to the 500k-group budget,
    ~100 MB — inside every reader pickled to a python worker. Workers
    rebuild their own cache from the (immutable) manifest files."""

    def __reduce__(self):
        return (_ResolveCache, ())


_RESOLVE_CACHE: dict[tuple, dict] = _ResolveCache()
_RESOLVE_CACHE_CAP = 256
_RESOLVE_CACHE_GROUP_CAP = 500_000


def _cache_key(table: str, version: int) -> tuple | None:
    p = os.path.join(_ledger_path(table), _manifest_name(version))
    try:
        st = os.stat(p)
    except OSError:
        return None
    # st_ino/st_dev guard the delete-and-recreate-same-path race: a
    # recreated table can reach the same version with an identical-size
    # manifest within one mtime-clock tick (filesystem timestamp
    # granularity), and serving the OLD table's cached state would point
    # readers at deleted data dirs. A fresh file always has a fresh
    # inode, so the recreated manifest misses.
    return (
        os.path.abspath(table), version,
        st.st_mtime_ns, st.st_size, st.st_ino, st.st_dev,
    )


def _cache_put(key: tuple | None, state: dict) -> None:
    if key is None:
        return
    _RESOLVE_CACHE.pop(key, None)
    cost = len(state["groups"])
    # Recomputed per put (≤ 256 entries) so external clear()s can't
    # desync an incremental counter.
    total = sum(len(s["groups"]) for s in _RESOLVE_CACHE.values())
    # Evict oldest-first (dicts preserve insertion order) until both
    # budgets fit; a single state larger than the whole group budget is
    # cached alone (the latest snapshot must stay resolvable cheaply).
    for k in list(_RESOLVE_CACHE):
        if (
            len(_RESOLVE_CACHE) < _RESOLVE_CACHE_CAP
            and total + cost <= _RESOLVE_CACHE_GROUP_CAP
        ):
            break
        total -= len(_RESOLVE_CACHE[k]["groups"])
        del _RESOLVE_CACHE[k]
    _RESOLVE_CACHE[key] = state


# Keys the resolution layer itself owns; anything else on a manifest is
# a per-commit annotation carried verbatim (restored_from, future ops).
_STATE_KEYS = {
    "version", "parent", "op", "ts", "key", "schema", "groups",
    "stats_cols", "txn", "txns", "txns_complete", "add", "remove",
}


def _check_txn_fresh(parent: dict, txn: dict | None, op: str) -> None:
    """Inside-the-attempt idempotence: raise TxnAlreadyApplied when the
    parent state already records this txn's (app, batch) — or a newer
    batch — as committed. MUST be checked against the parent the commit
    will actually link onto (any later racer produces a
    ConcurrentCommitError and the caller re-reads), never only as a
    pre-flight check."""
    if not txn or txn.get("app") is None or txn.get("batch") is None:
        return
    prev = (parent.get("txns") or {}).get(str(txn["app"]))
    if prev is not None and int(txn["batch"]) <= int(prev):
        raise TxnAlreadyApplied(
            f"{op}: txn app={txn['app']} batch={txn['batch']} already "
            f"applied (parent high-water {prev})"
        )


def _record_txn(txns: dict, txn: dict | None) -> dict:
    if txn and "app" in txn and "batch" in txn:
        prev = txns.get(txn["app"])
        txns[txn["app"]] = (
            txn["batch"] if prev is None else max(prev, txn["batch"])
        )
    return txns


def _state_from_full(raw: dict) -> dict:
    """A full manifest (create, or a legacy pre-delta-format table) IS
    the state. The per-app txn high-water map is complete only when
    this anchor is the chain root (create) — a legacy mid-chain anchor
    cannot see txn actions committed before it."""
    state = dict(raw)
    state["txns"] = _record_txn({}, raw.get("txn"))
    state["txns_complete"] = raw.get("parent") is None
    return state


def _state_from_checkpoint(raw: dict, chk: dict) -> dict:
    """Combine the delta manifest at a version (op/ts/txn identity) with
    the checkpoint written for that same version (groups/schema/txns —
    the checkpoint is materialized from the resolved state, so it
    already includes the delta's own effect)."""
    state = {
        "version": raw["version"],
        "parent": raw["parent"],
        "op": raw["op"],
        "ts": raw["ts"],
        "key": chk["key"],
        "schema": chk["schema"],
        "groups": chk["groups"],
        "txns": dict(chk.get("txns") or {}),
        "txns_complete": chk.get("txns_complete", True),
    }
    if chk.get("stats_cols"):
        state["stats_cols"] = chk["stats_cols"]
    if raw.get("txn") is not None:
        state["txn"] = raw["txn"]
    for k, v in raw.items():
        if k not in _STATE_KEYS:
            state[k] = v
    return state


def _apply_delta(state: dict, raw: dict) -> dict:
    removed = set(raw.get("remove") or [])
    groups = [
        g for g in state["groups"] if g["path"] not in removed
    ] + list(raw.get("add") or [])
    new = {
        "version": raw["version"],
        "parent": raw["parent"],
        "op": raw["op"],
        "ts": raw["ts"],
        "key": state["key"],
        "schema": raw.get("schema") or state["schema"],
        "groups": groups,
        "txns": _record_txn(
            dict(state.get("txns") or {}), raw.get("txn")
        ),
        "txns_complete": state.get("txns_complete", True),
    }
    if state.get("stats_cols"):
        new["stats_cols"] = state["stats_cols"]
    if raw.get("txn") is not None:
        new["txn"] = raw["txn"]
    for k, v in raw.items():
        if k not in _STATE_KEYS:
            new[k] = v
    return new


def _read_manifest(table: str, version: int) -> dict:
    """The RESOLVED table state at `version` — same shape as the old
    full-snapshot manifests (version/parent/op/ts/key/schema/groups,
    plus stats_cols/txn when present), reconstructed from the nearest
    anchor (create manifest, checkpoint, or legacy full manifest) plus
    the delta manifests after it. Walk length is bounded by
    CHECKPOINT_INTERVAL on any table the current code maintains."""
    try:
        return _resolve_state(table, version)
    except LedgerError:
        # A concurrent expire_history can delete a parent delta under a
        # running walk — but only AFTER materializing a checkpoint at
        # the oldest kept version, so one fresh walk finds the new
        # anchor before reaching the deleted file. A genuinely missing
        # version fails identically on the retry.
        return _resolve_state(table, version)


def _resolve_state(table: str, version: int) -> dict:
    pending: list[dict] = []
    pending_keys: list[tuple | None] = []
    v = version
    while True:
        key = _cache_key(table, v)
        state = _RESOLVE_CACHE.get(key) if key is not None else None
        if state is not None:
            break
        raw = _read_raw(table, v)
        if "groups" in raw:
            state = _state_from_full(raw)
            _cache_put(key, state)
            break
        chk = _read_checkpoint(table, v)
        if chk is not None:
            state = _state_from_checkpoint(raw, chk)
            _cache_put(key, state)
            break
        pending.append(raw)
        pending_keys.append(key)
        if raw.get("parent") is None:
            raise LedgerError(
                f"delta manifest {v} has no parent and no checkpoint: "
                f"{table}"
            )
        v = raw["parent"]
    for raw, key in zip(reversed(pending), reversed(pending_keys)):
        state = _apply_delta(state, raw)
        _cache_put(key, state)
    # Hand out a shallow copy with its own groups list so callers can't
    # corrupt the cached state (group entries themselves are shared by
    # reference everywhere, and never mutated).
    return dict(state, groups=list(state["groups"]))


def _delta_payload(manifest: dict, parent_state: dict) -> dict:
    """The on-disk delta form of a resolved manifest: groups added and
    removed vs the parent, schema only when it changed — O(change), not
    O(#groups), which is what keeps commits flat at 100 TB."""
    ppaths = {g["path"] for g in parent_state["groups"]}
    npaths = {g["path"] for g in manifest["groups"]}
    payload = {
        "version": manifest["version"],
        "parent": manifest["parent"],
        "op": manifest["op"],
        "ts": manifest["ts"],
    }
    add = [g for g in manifest["groups"] if g["path"] not in ppaths]
    remove = [
        g["path"] for g in parent_state["groups"]
        if g["path"] not in npaths
    ]
    if add:
        payload["add"] = add
    if remove:
        payload["remove"] = remove
    if manifest["schema"] != parent_state["schema"]:
        payload["schema"] = manifest["schema"]
    if manifest.get("txn") is not None:
        payload["txn"] = manifest["txn"]
    # Per-commit annotations (e.g. restore's restored_from) ride the
    # delta verbatim — they describe THIS version, not accumulated
    # state, exactly like txn.
    for k, v in manifest.items():
        if k not in _STATE_KEYS and k not in payload:
            payload[k] = v
    return payload


def _write_checkpoint(table: str, version: int) -> None:
    """Materialize the resolved state at `version` as a checkpoint file
    (create-if-absent; a concurrent checkpointer writing the identical
    content is harmless) and advance the ``_last_checkpoint`` pointer.
    Best-effort by design: a crash after the manifest link but before
    the checkpoint only lengthens the next reader's delta walk."""
    state = _read_manifest(table, version)
    chk = {
        "version": version,
        "key": state["key"],
        "schema": state["schema"],
        "groups": state["groups"],
        "txns": state.get("txns") or {},
        "txns_complete": state.get("txns_complete", True),
    }
    if state.get("stats_cols"):
        chk["stats_cols"] = state["stats_cols"]
    d = _ledger_path(table)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        # Compact separators: the checkpoint is the one O(#groups) file
        # the format still writes — pretty-printing inflated it ~40%
        # and dominated the amortized commit cost at the 10k-group tier.
        json.dump(chk, fh, separators=(",", ":"))
    try:
        os.link(tmp, os.path.join(d, _checkpoint_name(version)))
    except FileExistsError:
        pass  # an equivalent checkpoint already exists
    finally:
        os.unlink(tmp)
    # Pointer is a monotone hint (the Delta _last_checkpoint file):
    # readers that trust it skip the directory listing; correctness
    # never depends on it.
    ptr = os.path.join(d, _LAST_CHECKPOINT)
    try:
        with open(ptr) as fh:
            if json.load(fh).get("version", -1) >= version:
                return
    except (OSError, ValueError):
        pass
    _write_pointer(d, version)


def _write_pointer(ledger_dir: str, version: int) -> None:
    """Atomically (re)write the ``_last_checkpoint`` pointer file — the
    single place that knows its payload and write protocol (used by the
    monotone advance in _write_checkpoint AND the rewind in
    expire_history)."""
    tmp = os.path.join(ledger_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, os.path.join(ledger_dir, _LAST_CHECKPOINT))


def last_checkpoint(table: str) -> int | None:
    """The newest checkpointed version per the pointer file, or None."""
    try:
        with open(os.path.join(_ledger_path(table), _LAST_CHECKPOINT)) as fh:
            return json.load(fh)["version"]
    except (OSError, ValueError, KeyError):
        return None


def _commit(table: str, manifest: dict) -> int:
    """Atomically publish `manifest` as version parent+1 (create-if-
    absent via os.link); raises ConcurrentCommitError if a racing writer
    got there first. Returns the committed version.

    `manifest` is the RESOLVED new state (what _new_manifest builds);
    what lands on disk is its DELTA against the parent — except create,
    whose manifest is the chain's base anchor and stays full. Every
    CHECKPOINT_INTERVAL versions the committer also materializes a full
    checkpoint, after the commit point."""
    version = manifest["version"]
    d = _ledger_path(table)
    os.makedirs(d, exist_ok=True)
    if manifest.get("parent") is None:
        payload = {
            k: v for k, v in manifest.items()
            if k not in ("txns", "txns_complete")
        }
    else:
        parent_state = _read_manifest(table, manifest["parent"])
        payload = _delta_payload(manifest, parent_state)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    try:
        os.link(tmp, os.path.join(d, _manifest_name(version)))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} was committed concurrently: {table}"
        )
    finally:
        os.unlink(tmp)
    if version > 0 and version % CHECKPOINT_INTERVAL == 0:
        try:
            _write_checkpoint(table, version)
        except Exception:
            # Best-effort for real: the manifest is already linked, so
            # the commit SUCCEEDED — surfacing a checkpoint failure of
            # ANY kind here would make callers retry (and double-apply)
            # a write that landed. Checkpointing resolves state, so
            # besides I/O errors it can raise LedgerError (concurrently-
            # expired chain), ValueError (bad JSON), or KeyError/
            # TypeError (corrupt-but-parsable manifest) — the policy is
            # the blanket catch, not an enumeration that can lag the
            # implementation. A lost checkpoint only lengthens walks.
            pass
    return version


def history(table: str) -> list[dict]:
    """All manifests (resolved states), oldest first — the audit log of
    the table. Resolution is cached, so this is O(#versions) delta
    applications, not O(#versions * walk)."""
    return [_read_manifest(table, v) for v in _versions(table)]


# --------------------------------------------------------------------------
# Data-group plumbing
# --------------------------------------------------------------------------
# Types whose per-group min/max survive the JSON manifest with their
# order intact. date/timestamp are stored as ISO strings (lexicographic
# == chronological for the fixed-width format); decimal is excluded —
# float()-coercing it rounds, and a rounded bound can prune a group
# that actually contains matches.
_STATS_TYPES = {
    "byte", "short", "integer", "long", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz",
}


def _stat_value(v):
    """Coerce one min/max value to its JSON-manifest form, preserving
    order within the column's type."""
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v  # int/float/str/bool/None pass through


def _write_group(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key: str | None,
    stats_cols: list[str] | None = None,
) -> dict:
    """Write df as one new parquet file group and return its manifest
    entry (path, rows, key min/max, plus [min,max] per declared stats
    column). Stats ride the write itself via the Observation API — the
    rows are aggregated as they stream through the writer, so the group
    is written AND profiled in one pass (no re-read; at 100 TB the old
    write-then-rescan shape doubled the write path's read volume)."""
    from pyspark.sql import Observation

    gid = uuid.uuid4().hex
    rel = f"{_DATA_DIR}/{gid}"
    gpath = os.path.join(table, rel)
    aggs = [F.count(F.lit(1)).alias("rows")]
    if key is not None:
        aggs += [F.min(key).alias("__klo"), F.max(key).alias("__khi")]
    for c in stats_cols or []:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    obs = Observation()
    df.observe(obs, *aggs).write.parquet(gpath)
    stats = obs.get
    lo = _stat_value(stats["__klo"]) if key is not None else None
    hi = _stat_value(stats["__khi"]) if key is not None else None
    entry = {"path": rel, "rows": stats["rows"], "min_key": lo, "max_key": hi}
    if stats_cols:
        entry["stats"] = {
            c: [
                _stat_value(stats[f"__lo_{c}"]),
                _stat_value(stats[f"__hi_{c}"]),
            ]
            for c in stats_cols
        }
    return entry


def _snapshot_df(
    spark: SparkSession,
    table: str,
    manifest: dict,
    groups: list[dict],
    schema: StructType | None = None,
) -> DataFrame:
    """Scan `groups` with the manifest schema (or an explicit override —
    used to read pre-evolution groups with a widened schema: the parquet
    reader fills columns absent from a file with NULL, which is exactly
    the add-column evolution contract)."""
    schema = schema or StructType.fromJson(manifest["schema"])
    if not groups:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, g["path"]) for g in groups]
    # One multi-path scan: partition pruning and footer pushdown apply
    # across all live groups as if they were one dataset.
    return spark.read.schema(schema).parquet(*paths)


def _check_schema(manifest: dict, df: DataFrame, what: str) -> None:
    want = StructType.fromJson(manifest["schema"])
    got = df.schema
    if [(f.name, f.dataType) for f in want] != [
        (f.name, f.dataType) for f in got
    ]:
        raise LedgerError(
            f"{what}: schema mismatch\n  table: {want.simpleString()}"
            f"\n  data:  {got.simpleString()}"
        )


def _evolve_schema(
    manifest: dict, df: DataFrame, what: str, base_cols: set | None = None
) -> tuple[StructType | None, DataFrame]:
    """Validate df against the table schema under add-column evolution
    and align it: every column the caller's ORIGINAL table schema had
    must be present with its exact type (no drops, renames, or type
    changes — the safe subset), and any NEW df columns are appended as
    nullable. Table columns df lacks that are NOT in `base_cols` (the
    schema the caller first validated against) were added by a
    CONCURRENT writer between optimistic retries — those are NULL-filled
    with their table type, the same semantics readers give pre-evolution
    groups, instead of being misreported as drops. Returns
    (widened_schema_or_None, aligned_df); the schema is None when df
    adds nothing beyond the table."""
    want = StructType.fromJson(manifest["schema"])
    want_types = {f.name: f.dataType for f in want}
    got_types = {f.name: f.dataType for f in df.schema}
    if base_cols is None:
        base_cols = set(want_types)
    missing = [n for n in want_types if n not in got_types]
    dropped = [n for n in missing if n in base_cols]
    if dropped:
        raise LedgerError(
            f"{what}: schema evolution cannot drop columns {dropped} "
            "(add-column only)"
        )
    changed = [
        n for n, t in want_types.items()
        if n in got_types and got_types[n] != t
    ]
    if changed:
        raise LedgerError(
            f"{what}: schema evolution cannot change column types "
            f"{changed} (add-column only)"
        )
    for f in want:
        if f.name in missing:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    new_fields = [f for f in df.schema if f.name not in want_types]
    final = StructType(
        list(want)
        + [StructField(f.name, f.dataType, True) for f in new_fields]
    )
    df = df.select([f.name for f in final])
    return (final if new_fields else None), df


def _new_manifest(
    parent: dict,
    op: str,
    groups: list[dict],
    txn: dict | None = None,
    schema: StructType | None = None,
) -> dict:
    m = {
        "version": parent["version"] + 1,
        "parent": parent["version"],
        "op": op,
        "ts": time.time(),
        "key": parent["key"],
        "schema": schema.jsonValue() if schema is not None
        else parent["schema"],
        "groups": groups,
    }
    if parent.get("stats_cols"):
        m["stats_cols"] = parent["stats_cols"]
    if txn is not None:
        m["txn"] = txn
    return m


def latest_txn(table: str, app: str) -> int | None:
    """The highest batch id committed under transactional identity
    `app`, or None — how a restarted streaming writer discovers which
    micro-batches already landed (the Delta txn-action pattern).

    Checkpoints carry the accumulated per-app high-water map, so this
    costs one resolution walk (≤ CHECKPOINT_INTERVAL delta reads), not
    an O(#versions) scan — the metadata-plane property a 100 TB stream
    restart needs. Legacy full-manifest chains whose root was expired
    fall back to the full history scan (their map is incomplete)."""
    state = _read_manifest(table, latest_version(table))
    if state.get("txns_complete", True):
        return (state.get("txns") or {}).get(app)
    best = None
    for m in history(table):
        t = m.get("txn")
        if t and t.get("app") == app:
            best = t["batch"] if best is None else max(best, t["batch"])
    return best


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------
def create(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key: str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Create a ledger table at `table` from df as version 0. `key` is
    the stats column used for group pruning in merge/delete — pick the
    natural clustering key (the merge key of the incremental feed).
    `stats_cols` declares EXTRA columns whose per-group [min,max] every
    write records, enabling `read(between={col: ...})` data skipping on
    non-key columns (e.g. an event-time column on an id-keyed table)."""
    if os.path.isdir(_ledger_path(table)) and _versions(table):
        raise LedgerError(f"table already exists: {table}")
    if key is not None and key not in df.columns:
        raise LedgerError(f"key column {key!r} not in schema")
    types = {f.name: f.dataType for f in df.schema}
    for c in stats_cols or []:
        if c not in types:
            raise LedgerError(f"stats column {c!r} not in schema")
        if types[c].typeName() not in _STATS_TYPES:
            raise LedgerError(
                f"stats column {c!r} has type {types[c].simpleString()}; "
                "order-preserving manifest stats require one of: "
                + ", ".join(sorted(_STATS_TYPES))
            )
    os.makedirs(table, exist_ok=True)
    group = _write_group(spark, table, df, key, stats_cols)
    manifest = {
        "version": 0,
        "parent": None,
        "op": "create",
        "ts": time.time(),
        "key": key,
        "schema": df.schema.jsonValue(),
        "groups": [group],
    }
    if stats_cols:
        manifest["stats_cols"] = list(stats_cols)
    return _commit(table, manifest)


def read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    key_between: tuple | None = None,
    between: dict | None = None,
) -> DataFrame:
    """Snapshot read: the table as of `version` (default: latest). Time
    travel is free — every manifest is immutable and complete.

    `key_between=(lo, hi)` and `between={col: (lo, hi), ...}` are
    manifest-level data skipping: groups whose [min,max] range for the
    key (or any declared stats column) misses the closed interval are
    dropped BEFORE the scan is planned (driver-side, O(#groups)
    metadata — at 100 TB a ranged lookup reads a handful of groups, not
    the table), and the residual filters are applied to the surviving
    rows, so the result equals a plain filter of the full snapshot.
    Several `between` columns compose conjunctively. Groups lacking
    stats for a column (pre-evolution groups) are conservatively kept."""
    v = latest_version(table) if version is None else version
    manifest = _read_manifest(table, v)
    groups = manifest["groups"]
    key = manifest["key"]
    bounds = dict(between or {})
    if key_between is not None:
        if key is None:
            raise LedgerError("key_between requires a table with a key")
        if key in bounds:
            # Two bounds for the same column would silently shadow one
            # another; intersect the closed intervals instead so both
            # constraints prune and filter.
            blo, bhi = bounds[key]
            klo, khi = key_between
            bounds[key] = (max(blo, klo), min(bhi, khi))
        else:
            bounds[key] = key_between
    if not bounds:
        return _snapshot_df(spark, table, manifest, groups)

    stats_cols = set(manifest.get("stats_cols") or [])
    col_types = {
        f.name: f.dataType.typeName()
        for f in StructType.fromJson(manifest["schema"])
    }
    residual = []
    for col, (lo, hi) in bounds.items():
        if col != key and col not in stats_cols:
            raise LedgerError(
                f"no manifest stats for column {col!r}: declare it in "
                "stats_cols at create, or filter the snapshot directly"
            )

        def _bound(v, col=col):
            # Mixed-precision bounds must match the column's stored
            # stat format or lexicographic pruning diverges from the
            # residual filter. A date bound on a TIMESTAMP column is
            # promoted to midnight ("1995-12-31" sorts before
            # "1995-12-31 00:00:00" and would over-prune). A datetime
            # bound on a DATE column is truncated to its date — for
            # the lower bound that is conservative (keeps extra
            # groups), for the upper bound it is exact (a date matches
            # `<= ts` iff date <= ts.date() under Spark's
            # date->midnight coercion).
            t = col_types.get(col, "")
            if (
                t.startswith("timestamp")
                and isinstance(v, datetime.date)
                and not isinstance(v, datetime.datetime)
            ):
                v = datetime.datetime.combine(v, datetime.time.min)
            elif t == "date" and isinstance(v, datetime.datetime):
                v = v.date()
            return _stat_value(v)

        clo, chi = _bound(lo), _bound(hi)

        def _keep(g, col=col, clo=clo, chi=chi):
            if col == key:
                glo, ghi = g["min_key"], g["max_key"]
            else:
                glo, ghi = (g.get("stats") or {}).get(col, (None, None))
            if glo is None or ghi is None:
                return True  # no stats -> must assume it may match
            return not (ghi < clo or glo > chi)

        groups = [g for g in groups if _keep(g)]
        residual.append(F.col(col).between(lo, hi))
    df = _snapshot_df(spark, table, manifest, groups)
    for pred in residual:
        df = df.filter(pred)
    return df


def append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    txn: dict | None = None,
    merge_schema: bool = False,
    retries: int = 5,
) -> int:
    """Add rows without touching existing groups (blind append). With
    `merge_schema=True`, df may ADD nullable columns (add-column
    evolution): the commit records the widened schema and old groups
    are untouched — readers fill the new columns with NULL there.

    Optimistic-concurrency retry: an append conflicts with NOTHING —
    losing the version race just means re-reading the new parent and
    re-publishing the SAME already-written group against it (no data
    rewrite; schema is re-validated per attempt in case a racer
    evolved it). Up to `retries` re-attempts, then the conflict
    propagates."""
    df0 = df
    group = None
    base_cols = None
    for attempt in range(retries + 1):
        parent = _read_manifest(table, latest_version(table))
        _check_txn_fresh(parent, txn, "append")
        schema = None
        if merge_schema:
            if base_cols is None:
                base_cols = {
                    f["name"] for f in parent["schema"]["fields"]
                }
            schema, df = _evolve_schema(parent, df0, "append", base_cols)
        else:
            _check_schema(parent, df0, "append")
            df = df0
        if group is None:  # data is written exactly once
            group = _write_group(
                spark, table, df, parent["key"], parent.get("stats_cols")
            )
        try:
            return _commit(
                table,
                _new_manifest(
                    parent, "append", parent["groups"] + [group], txn, schema
                ),
            )
        except ConcurrentCommitError:
            if attempt == retries:
                raise


def overwrite(spark: SparkSession, table: str, df: DataFrame) -> int:
    """Replace the table contents (a new full snapshot; old versions
    stay readable until expire_history + vacuum)."""
    parent = _read_manifest(table, latest_version(table))
    _check_schema(parent, df, "overwrite")
    group = _write_group(
        spark, table, df, parent["key"], parent.get("stats_cols")
    )
    return _commit(table, _new_manifest(parent, "overwrite", [group]))


def _overlaps(g: dict, lo, hi) -> bool:
    if g["min_key"] is None or g["max_key"] is None:
        return True  # no stats -> must assume it may contain the keys
    return not (g["max_key"] < lo or g["min_key"] > hi)


def merge(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    txn: dict | None = None,
    merge_schema: bool = False,
    retries: int = 3,
) -> int:
    """MERGE INTO: WHEN MATCHED (on the table key) UPDATE to the source
    row, WHEN NOT MATCHED INSERT it — the z8330 relational semantics,
    executed copy-on-write on storage. Only file groups whose key range
    overlaps the source's [min,max] are read and rewritten; everything
    else carries over by reference. With `merge_schema=True`, source
    may ADD nullable columns (add-column evolution): touched target
    rows read the new columns as NULL before the upsert, untouched
    groups stay physically narrow and read as NULL forever after.

    Optimistic-concurrency retry: unlike append, a lost race
    invalidates the merged result (a racer may have changed the touched
    groups), so each re-attempt recomputes against the fresh parent and
    rewrites; the failed attempt's group becomes a vacuum-able orphan.
    The source preflight (one agg) runs once."""
    source0 = source
    bounds = None
    base_cols = None
    for attempt in range(retries + 1):
        parent = _read_manifest(table, latest_version(table))
        _check_txn_fresh(parent, txn, "merge")
        key = parent["key"]
        if key is None:
            raise LedgerError("merge requires a table created with a key")
        schema = None
        if merge_schema:
            if base_cols is None:
                base_cols = {
                    f["name"] for f in parent["schema"]["fields"]
                }
            schema, source = _evolve_schema(
                parent, source0, "merge", base_cols
            )
        else:
            _check_schema(parent, source0, "merge")
            source = source0

        if bounds is None:
            # One agg over the source covers both preflights: MERGE is
            # ill-defined when two source rows hit one target row (the
            # production formats reject it, so do we — count vs
            # distinct-count detects it), and the key bounds drive the
            # group pruning below.
            bounds = source.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.col(key)).alias("nd"),
                F.count(key).alias("nk"),
                F.min(key).alias("lo"),
                F.max(key).alias("hi"),
            ).first()
            if bounds["nd"] < bounds["nk"] or bounds["nk"] < bounds["n"]:
                # nd < nk: two rows share a key; nk < n: NULL keys
                # (each an unmatchable insert — reject like a dup).
                raise LedgerError("merge source has duplicate or NULL keys")

        try:
            if bounds["lo"] is None:  # empty source: no-op version
                return _commit(
                    table,
                    _new_manifest(
                        parent, "merge", parent["groups"], txn, schema
                    ),
                )

            blo = _stat_value(bounds["lo"])
            bhi = _stat_value(bounds["hi"])
            touched = [
                g for g in parent["groups"] if _overlaps(g, blo, bhi)
            ]
            tpaths = {g["path"] for g in touched}
            kept = [
                g for g in parent["groups"] if g["path"] not in tpaths
            ]

            tgt = _snapshot_df(spark, table, parent, touched, schema)
            # Upsert: target rows whose key is not in the source
            # survive; every source row lands (update == replace-whole-
            # row, insert == new key). No broadcast hint — the delta
            # may be any size; AQE picks the join.
            merged = tgt.join(
                source.select(key), key, "left_anti"
            ).unionByName(source)

            group = _write_group(
                spark, table, merged, key, parent.get("stats_cols")
            )
            return _commit(
                table,
                _new_manifest(parent, "merge", kept + [group], txn, schema),
            )
        except ConcurrentCommitError:
            if attempt == retries:
                raise


def delete_where(
    spark: SparkSession, table: str, predicate: Column | str
) -> int:
    """DELETE WHERE, copy-on-write, in TWO jobs regardless of group
    count (a per-group driver loop would be thousands of tiny jobs at
    100 TB):

      1. PROBE — one snapshot scan with the predicate pushed down,
         grouped by the group each row came from (``input_file_name``
         -> group dir), yielding the set of groups that contain
         matches. Groups without matches carry over by reference.
      2. REWRITE — one pass over only the matched groups: survivors
         keep their group identity through a ``partitionBy`` staged
         write (so per-group clustering and prunable key ranges are
         preserved), one column-pruned stats agg, then pure metadata
         moves — the same one-write-job shape as optimize_zorder.

    A group whose every row matches is simply dropped (its staged
    partition is empty)."""
    parent = _read_manifest(table, latest_version(table))
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    groups = parent["groups"]
    if not groups:
        return _commit(table, _new_manifest(parent, "delete", []))

    # Group dir name (the uuid under data/) identifies each group in
    # input_file_name's path: .../data/<gid>/part-....parquet
    gid_of = {g["path"].split("/")[-1]: g for g in groups}
    gid_col = F.element_at(F.split(F.input_file_name(), "/"), -2)

    snap = _snapshot_df(spark, table, parent, groups)
    matched_gids = {
        r["__g"]
        for r in snap.filter(pred)
        .select(gid_col.alias("__g"))
        .distinct()
        .collect()
    }
    kept = [g for k, g in gid_of.items() if k not in matched_gids]
    if not matched_gids:
        return _commit(table, _new_manifest(parent, "delete", kept))

    matched = [gid_of[k] for k in sorted(matched_gids)]
    survivors = (
        _snapshot_df(spark, table, parent, matched)
        # Letter-prefix the partition value: an all-digit gid would
        # round-trip through partition-type inference as a NUMBER and
        # the staged dir name would no longer match on os.rename.
        .withColumn("__g", F.concat(F.lit("g"), gid_col))
        # SQL DELETE removes rows where pred is TRUE; a NULL predicate
        # KEEPS the row. A bare ~pred turns NULL into NULL (filtered
        # out), silently deleting NULL-predicate rows — and only in
        # groups containing a true match, making results depend on
        # physical layout.
        .filter(~F.coalesce(pred, F.lit(False)))
    )
    rewritten = _rewrite_partitioned(spark, table, parent, survivors, "__g")
    return _commit(
        table, _new_manifest(parent, "delete", kept + rewritten)
    )


def details(table: str, version: int | None = None) -> dict:
    """DESCRIBE DETAIL: operator-facing diagnostics of one version,
    computed from the manifest alone (no data read). `key_overlap` is
    the clustering-quality signal: the fraction of groups whose key
    range overlaps the NEXT group's in key order — 0.0 means perfectly
    disjoint ranges (every key lookup hits one group), values near 1.0
    mean the ranges interleave and key pruning degrades to scanning
    everything. Rises as unordered appends accumulate; compact() or a
    key-clustered optimize_zorder() drives it back down."""
    v = latest_version(table) if version is None else version
    m = _read_manifest(table, v)
    groups = m["groups"]
    sizes = [g["rows"] for g in groups]
    ranged = sorted(
        (g for g in groups if g["min_key"] is not None),
        key=lambda g: (g["min_key"], g["max_key"]),
    )
    overlaps = sum(
        1
        for a, b in zip(ranged, ranged[1:])
        if b["min_key"] <= a["max_key"]
    )
    chk = last_checkpoint(table)
    return {
        "version": v,
        "op": m["op"],
        "key": m["key"],
        "stats_cols": m.get("stats_cols") or [],
        "num_groups": len(groups),
        "rows": sum(sizes),
        "min_group_rows": min(sizes) if sizes else 0,
        "max_group_rows": max(sizes) if sizes else 0,
        "key_overlap": round(overlaps / max(1, len(ranged) - 1), 4)
        if len(ranged) > 1
        else 0.0,
        "columns": [
            f["name"] for f in m["schema"]["fields"]
        ],
        # Metadata-plane health (r13): how far resolution walks from the
        # newest checkpoint, and how many manifests a restart scans.
        "last_checkpoint": chk,
        "versions_since_checkpoint": (
            latest_version(table) - chk if chk is not None else None
        ),
        "num_versions": len(_versions(table)),
    }


def restore(table: str, version: int) -> int:
    """RESTORE: make the table's latest state equal an earlier
    version's — committed as a NEW version referencing the old file
    groups, so it is pure metadata (no data copied), the bad commits
    stay in history for audit, and a restore of the restore is
    possible. The bad-merge recovery path: history is never rewritten,
    only extended (the Delta RESTORE semantics). The restored version's
    schema comes along, which also undoes a schema evolution."""
    old = _read_manifest(table, version)
    parent = _read_manifest(table, latest_version(table))
    m = _new_manifest(
        parent,
        "restore",
        old["groups"],
        schema=StructType.fromJson(old["schema"]),
    )
    m["restored_from"] = version
    return _commit(table, m)


def expire_history(table: str, keep_last: int) -> list[int]:
    """Drop all but the newest `keep_last` manifests (their data groups
    become vacuum-able if nothing newer references them). Returns the
    expired versions.

    Delta manifests resolve against older anchors, so before deleting
    anything this materializes a checkpoint AT the oldest kept version
    (while its parents still exist) — the kept chain stays resolvable
    with no reference to expired files. Checkpoints older than the
    oldest kept version are dropped with their manifests."""
    if keep_last < 1:
        raise LedgerError("keep_last must be >= 1")
    vs = _versions(table)
    expired = vs[:-keep_last]
    if not expired:
        return []
    oldest_kept = vs[-keep_last]
    raw = _read_raw(table, oldest_kept)
    if "groups" not in raw and _read_checkpoint(table, oldest_kept) is None:
        _write_checkpoint(table, oldest_kept)
    d = _ledger_path(table)
    for v in expired:
        os.unlink(os.path.join(d, _manifest_name(v)))
        chk = os.path.join(d, _checkpoint_name(v))
        if os.path.exists(chk):
            os.unlink(chk)
    # When the oldest kept version is a FULL manifest (legacy table, or
    # the create anchor) no fresh checkpoint was materialized above, so
    # deleting expired checkpoints can leave the _last_checkpoint
    # pointer dangling at a file that no longer exists — last_checkpoint
    # and details() would then report a phantom checkpoint and
    # versions_since_checkpoint would understate the walk. Rewind the
    # pointer to the newest SURVIVING checkpoint, or drop it if none.
    ptr_v = last_checkpoint(table)
    if ptr_v is not None and not os.path.exists(
        os.path.join(d, _checkpoint_name(ptr_v))
    ):
        surviving = [
            int(f[len(_CHECKPOINT_PREFIX):].split(".")[0])
            for f in os.listdir(d)
            if f.startswith(_CHECKPOINT_PREFIX) and f.endswith(".json")
        ]
        if surviving:
            _write_pointer(d, max(surviving))
        else:
            os.unlink(os.path.join(d, _LAST_CHECKPOINT))
    return expired


def vacuum(
    table: str,
    staging_retention_s: float = 24 * 3600,
    group_retention_s: float = 24 * 3600,
) -> list[str]:
    """Delete data groups referenced by NO remaining manifest — orphans
    of crashed writers and groups released by expire_history. Snapshot
    READS are safe by construction (they resolve manifests, and every
    manifest's groups are kept), but a STREAMING replay can hold
    planned-but-unread group paths from already-expired versions — so,
    like the production formats, unreferenced groups are only collected
    once older than `group_retention_s` (Delta's vacuum retention;
    pass 0 to force-collect in tests). Returns the removed paths."""
    live = {
        g["path"] for m in history(table) for g in m["groups"]
    }
    d = os.path.join(table, _DATA_DIR)
    now = time.time()
    removed = []
    for gid in sorted(os.listdir(d)) if os.path.isdir(d) else []:
        rel = f"{_DATA_DIR}/{gid}"
        if rel not in live and (
            now - _newest_mtime(os.path.join(d, gid)) >= group_retention_s
        ):
            shutil.rmtree(os.path.join(d, gid))
            removed.append(rel)
    # Crashed rewrite runs leave a staging dir at the table root; no
    # manifest ever references one, but a CONCURRENTLY RUNNING
    # optimize/compact/delete owns its staging dir until it commits —
    # only collect dirs older than the retention window (the
    # production-vacuum posture; pass 0 to force-collect in tests).
    now = time.time()
    for name in sorted(os.listdir(table)):
        p = os.path.join(table, name)
        if name.startswith(_STAGING_PREFIX) and (
            now - _newest_mtime(p) >= staging_retention_s
        ):
            shutil.rmtree(p)
            removed.append(name)
    return removed


def _newest_mtime(root: str) -> float:
    """The newest mtime anywhere under `root`. The top-level dir mtime
    is set when partition subdirs are created at the START of a staged
    rewrite and file writes inside them do not touch it — keying
    retention off it alone could vacuum the live staging dir of a
    rewrite still running past the window."""
    newest = os.path.getmtime(root)
    for dirpath, _dirnames, filenames in os.walk(root):
        for entry in [dirpath] + [
            os.path.join(dirpath, f) for f in filenames
        ]:
            try:
                newest = max(newest, os.path.getmtime(entry))
            except OSError:
                pass  # racing writer may move files mid-walk
    return newest


def compact(
    spark: SparkSession, table: str, max_rows: int = 1_000_000
) -> int:
    """OPTIMIZE: rewrite runs of small file groups into fewer large
    ones — the small-file remedy for streaming ingest, where every
    micro-batch commit adds a tiny group and a 100 TB table would
    otherwise accumulate millions of them (scan planning, footer reads,
    and manifest size all degrade with group count).

    Pure metadata + copy-on-write: groups with >= max_rows rows carry
    over by reference; the small ones are bin-packed (in key order, so
    the merged groups keep tight non-overlapping key ranges and stay
    prunable) into bins of ~max_rows rows, and each bin is rewritten as
    one group — ALL bins in one staged partitionBy write + one stats
    agg (a bin-per-job driver loop would be thousands of jobs on a
    streaming-aged table). Contents are untouched — the committed
    snapshot is row-identical, only the file layout changes — so
    readers of older versions are unaffected and vacuum reclaims the
    small groups once their manifests expire."""
    parent = _read_manifest(table, latest_version(table))
    big = [g for g in parent["groups"] if g["rows"] >= max_rows]
    small = [g for g in parent["groups"] if g["rows"] < max_rows]
    if len(small) <= 1:  # nothing to pack
        m = _new_manifest(parent, "compact", parent["groups"])
        m["data_change"] = False  # row-identical relayout (Delta dataChange)
        return _commit(table, m)

    small.sort(key=lambda g: (g["min_key"] is None, g["min_key"]))
    bins: list[list[dict]] = [[]]
    acc = 0
    for g in small:
        if bins[-1] and acc + g["rows"] > max_rows:
            bins.append([])
            acc = 0
        bins[-1].append(g)
        acc += g["rows"]

    rewritten = [b[0] for b in bins if len(b) == 1]  # by reference
    multi = [b for b in bins if len(b) > 1]
    if multi:
        # Every row's bin is a function of its source group: map the
        # group dir uuid (from input_file_name) to its bin id with one
        # literal map — O(#small groups) plan size, zero shuffles.
        bin_of = {
            g["path"].split("/")[-1]: i
            for i, b in enumerate(multi)
            for g in b
        }
        mapping = F.create_map(
            *[F.lit(x) for kv in bin_of.items() for x in kv]
        )
        packed = [g for b in multi for g in b]
        df = _snapshot_df(spark, table, parent, packed).withColumn(
            "__bin",
            mapping[
                F.element_at(F.split(F.input_file_name(), "/"), -2)
            ],
        )
        rewritten += _rewrite_partitioned(spark, table, parent, df, "__bin")
    m = _new_manifest(parent, "compact", big + rewritten)
    # Row-identical relayout: streaming sources skip it instead of
    # failing or re-emitting the whole table (the Delta dataChange=false
    # contract) — compact is the maintenance op streamed tables NEED.
    m["data_change"] = False
    return _commit(table, m)


def _dedupe_sorted(vals: list) -> list:
    uniq: list = []
    for v in vals:
        if not uniq or v > uniq[-1]:
            uniq.append(v)
    return uniq


def _rank_code(
    df: DataFrame, col: str, bits: int, total_rows: int
) -> Column:
    """A 0..2^bits-1 rank code for `col`: quantile boundaries computed
    once driver-side (O(2^bits) values), then a JVM higher-order
    count-of-boundaries-below per row — no global window, no shuffle,
    codegen-friendly. Rank coding (vs raw bit truncation) makes the
    z-curve skew-proof: each code level holds ~equal row mass whatever
    the value distribution. NULLs code to 0 (cluster first).

    Numeric/date/timestamp columns use approxQuantile on a numeric
    proxy. Strings use a RangePartitioner-style bounded random sample
    (~64 candidates per boundary, ≤ 2^bits * 64 values on the driver) —
    sampling quality only affects layout balance, never correctness:
    the optimized snapshot is row-identical for ANY boundary choice."""
    n = 1 << bits
    t = dict(df.dtypes)[col]
    if t == "string":
        target = n * 64
        frac = min(1.0, 1.2 * target / max(1, total_rows))
        vals = sorted(
            r[0]
            for r in df.select(col).dropna().sample(frac, seed=42).collect()
        )
        if not vals:
            return F.lit(0)
        step = max(1, len(vals) // n)
        bnds = _dedupe_sorted(
            [vals[i] for i in range(step, len(vals), step)]
        )[: n - 1]
        if not bnds:
            return F.lit(0)
        code = F.size(
            F.filter(
                F.lit(bnds).cast("array<string>"),
                lambda b: b <= F.col(col),
            )
        )
        return F.when(F.col(col).isNull(), F.lit(0)).otherwise(code)

    if t in ("date", "timestamp", "timestamp_ntz"):
        proxy = F.col(col).cast("timestamp").cast("long").cast("double")
    elif t in ("tinyint", "smallint", "int", "bigint", "float", "double"):
        proxy = F.col(col).cast("double")
    else:
        raise LedgerError(
            f"optimize_zorder: column {col!r} has type {t}; cluster "
            "columns must be numeric/date/timestamp/string (declared "
            "limitation)"
        )
    probs = [i / n for i in range(1, n)]
    bnds = _dedupe_sorted(
        df.select(proxy.alias("__p")).approxQuantile("__p", probs, 0.001)
    )
    if not bnds:  # empty / all-NULL column: everything codes to 0
        return F.lit(0)
    code = F.size(
        F.filter(F.lit(bnds).cast("array<double>"), lambda b: b <= proxy)
    )
    return F.when(proxy.isNull(), F.lit(0)).otherwise(code)


def optimize_zorder(
    spark: SparkSession,
    table: str,
    cluster_by: list[str],
    target_rows: int = 1_000_000,
    bits: int = 8,
    key_between: tuple | None = None,
) -> int:
    """OPTIMIZE ... ZORDER BY: rewrite the current snapshot clustered on
    the Morton interleave of per-column quantile-rank codes, cutting the
    new file groups on z-value quantiles — so every cluster dimension's
    per-group [min,max] envelope tightens at once and `read(between=)`
    prunes on ANY of them (single-column sort gives this for one
    dimension only). Snapshot row-identical; the commit is a new
    version, so time travel and vacuum behave as for compact().

    The 100 TB shape: two approxQuantile passes column-pruned to the
    cluster columns, ONE full write job (partitionBy on the z-bucket —
    no driver loop over buckets), one column-pruned stats agg over the
    staged output, then pure metadata moves. Driver state is O(#groups
    + 2^bits * #cluster_by) — never row data.

    `key_between=(lo, hi)` makes the optimize INCREMENTAL (Delta's
    OPTIMIZE ... WHERE): only groups whose key range overlaps the
    interval are rewritten; all other groups carry over by reference.
    The streaming-ingest pattern is to optimize the fresh tail of the
    keyspace on a cadence instead of re-laying the whole table.

    Declared limits: numeric/date/timestamp/string cluster columns
    (see _rank_code); incremental selection is whole-group (a selected
    group is rewritten in full, which preserves row identity
    trivially)."""
    parent = _read_manifest(table, latest_version(table))
    if not cluster_by:
        raise LedgerError("optimize_zorder: cluster_by must be non-empty")
    schema = StructType.fromJson(parent["schema"])
    names = [f.name for f in schema]
    for c in cluster_by:
        if c not in names:
            raise LedgerError(f"cluster column {c!r} not in schema")

    if key_between is not None:
        if parent["key"] is None:
            raise LedgerError("key_between requires a table with a key")
        klo, khi = _stat_value(key_between[0]), _stat_value(key_between[1])
        selected = [g for g in parent["groups"] if _overlaps(g, klo, khi)]
        spaths = {g["path"] for g in selected}
        untouched = [
            g for g in parent["groups"] if g["path"] not in spaths
        ]
    else:
        selected = parent["groups"]
        untouched = []
    if not selected:  # nothing overlaps: commit a no-op version
        m = _new_manifest(parent, "optimize", parent["groups"])
        m["data_change"] = False
        return _commit(table, m)

    snap = _snapshot_df(spark, table, parent, selected)
    total = sum(g["rows"] for g in selected)
    num_groups = max(1, -(-total // max(1, target_rows)))

    # Per-column rank codes -> Morton interleave (bit j of column i
    # lands at position j*ncols + i, the classic z-curve).
    ncols = len(cluster_by)
    if ncols * bits > 63:
        raise LedgerError(
            f"optimize_zorder: {ncols} columns x {bits} bits exceeds the "
            "63-bit z-value budget; lower bits or cluster fewer columns"
        )
    zval = F.lit(0).cast("long")
    for i, c in enumerate(cluster_by):
        code = _rank_code(snap, c, bits, total)
        for j in range(bits):
            # Cast the bit to LONG before the shift: shifting the
            # IntegerType bit wraps at position 31 (and Java masks the
            # shift amount to 5 bits), silently corrupting the z-order
            # for ncols*bits > 31.
            zval = zval + F.shiftleft(
                F.shiftright(code, j).bitwiseAND(F.lit(1)).cast("long"),
                j * ncols + i,
            )
    staged = snap.withColumn("__zval", zval)

    # Cut groups on z-value quantiles: ~equal rows per group.
    probs = [i / num_groups for i in range(1, num_groups)]
    uniq = _dedupe_sorted(
        staged.select("__zval").approxQuantile("__zval", probs, 0.001)
        if probs
        else []
    )
    if uniq:
        bucket = F.size(
            F.filter(
                F.lit(uniq).cast("array<double>"),
                lambda b: b <= F.col("__zval"),
            )
        )
    else:
        bucket = F.lit(0)

    staged_out = (
        staged.withColumn("__zbucket", bucket)
        .select(*names, "__zbucket", "__zval")
        # Repartition on the bucket BEFORE the partitioned write: each
        # task then feeds ~one bucket (otherwise every task opens a
        # file in every bucket -> tasks x groups tiny files). Hash
        # repartition, not repartitionByRange — the bucket ids are
        # already the explicit range cut, so range sampling would be a
        # wasted extra pass. sortWithinPartitions keeps rows z-sorted
        # inside each group's files so parquet row-group footer stats
        # stay tight.
        .repartition(num_groups, F.col("__zbucket"))
        .sortWithinPartitions("__zbucket", "__zval")
        .drop("__zval")
    )
    groups = _rewrite_partitioned(
        spark, table, parent, staged_out, "__zbucket"
    )
    m = _new_manifest(parent, "optimize", untouched + groups)
    m["data_change"] = False  # row-identical relayout (Delta dataChange)
    return _commit(table, m)


def _rewrite_partitioned(
    spark: SparkSession,
    table: str,
    parent: dict,
    df: DataFrame,
    part_col: str,
) -> list[dict]:
    """Shared rewrite machinery for optimize_zorder and delete_where:
    stage `df` (table columns + `part_col`) as ONE ``partitionBy``
    parquet write, compute every new group's stats in ONE column-pruned
    agg over the staged output, then move each partition dir into
    data/ as a group — metadata-only from there. One write job + one
    agg job regardless of how many groups come out."""
    # Not dot/underscore-prefixed: Spark's hidden-path filter would
    # ignore it on the stats read-back. vacuum() collects crashed
    # writers' leftover staging dirs by this prefix.
    staging = os.path.join(table, f"{_STAGING_PREFIX}{uuid.uuid4().hex}")
    try:
        df.write.partitionBy(part_col).parquet(staging)
        if not any(
            name.startswith(f"{part_col}=")
            for name in os.listdir(staging)
        ):
            return []  # zero surviving rows: no groups come out
        back = spark.read.parquet(staging)
        stats_cols = parent.get("stats_cols") or []
        key = parent["key"]
        aggs = [F.count(F.lit(1)).alias("rows")]
        if key is not None:
            aggs += [F.min(key).alias("__klo"), F.max(key).alias("__khi")]
        for c in stats_cols:
            aggs += [
                F.min(c).alias(f"__lo_{c}"),
                F.max(c).alias(f"__hi_{c}"),
            ]
        per_part = back.groupBy(part_col).agg(*aggs).collect()

        groups = []
        for row in sorted(per_part, key=lambda r: str(r[part_col])):
            gid = uuid.uuid4().hex
            rel = f"{_DATA_DIR}/{gid}"
            os.rename(
                os.path.join(staging, f"{part_col}={row[part_col]}"),
                os.path.join(table, rel),
            )
            entry = {
                "path": rel,
                "rows": row["rows"],
                "min_key": _stat_value(row["__klo"])
                if key is not None
                else None,
                "max_key": _stat_value(row["__khi"])
                if key is not None
                else None,
            }
            if stats_cols:
                entry["stats"] = {
                    c: [
                        _stat_value(row[f"__lo_{c}"]),
                        _stat_value(row[f"__hi_{c}"]),
                    ]
                    for c in stats_cols
                }
            groups.append(entry)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return groups


def changes(
    spark: SparkSession, table: str, from_version: int, to_version: int
) -> DataFrame:
    """Change feed between two versions: every row with a _change_type
    of 'insert' (present at to_version, absent at from_version) or
    'delete' (the reverse) — an update appears as its delete + insert
    pair, the classic CDF encoding without per-row tracking columns.

    The 100 TB property: only groups that DIFFER between the two
    manifests are scanned — groups carried by reference between the
    versions (the vast majority under copy-on-write) contribute no
    change and are never read. Within the differing groups the
    delta is exact multiset difference (exceptAll both ways), a
    key-less shuffle bounded by the rewritten data, not the table."""
    mf = _read_manifest(table, from_version)
    mt = _read_manifest(table, to_version)
    pf = {g["path"] for g in mf["groups"]}
    pt = {g["path"] for g in mt["groups"]}
    only_old = [g for g in mf["groups"] if g["path"] not in pt]
    only_new = [g for g in mt["groups"] if g["path"] not in pf]
    # Across an add-column evolution boundary both sides are read with
    # the newer (wider) schema, so an old row compares as its new-schema
    # form (new columns NULL) — a row whose only change is gaining a
    # non-NULL value in a new column shows up as delete+insert.
    schema = StructType.fromJson(mt["schema"])
    old_df = _snapshot_df(spark, table, mf, only_old, schema)
    new_df = _snapshot_df(spark, table, mt, only_new, schema)
    return new_df.exceptAll(old_df).withColumn(
        "_change_type", F.lit("insert")
    ).unionByName(
        old_df.exceptAll(new_df).withColumn("_change_type", F.lit("delete"))
    )
