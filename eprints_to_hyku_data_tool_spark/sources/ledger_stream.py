"""Ledger tables as a Spark data source: ``format("ledger")`` for both
batch and STREAMING reads, via the PySpark 4 Python DataSource API.

The streaming half is the capability that matters: a ledger table's
manifest log is already an ordered, immutable commit history, so it is
a natural streaming source — exactly the Delta streaming-source
pattern, rebuilt on this repo's format:

- **Offsets are manifest versions.** ``initialOffset`` = the table's
  latest version when the stream starts (option ``startingVersion``
  overrides — ``0`` replays the whole table); ``latestOffset`` = the
  current latest manifest. Every micro-batch covers the half-open
  version interval (start, end].
- **Partitions are file groups.** A micro-batch's input is the set of
  groups ADDED in its version interval — under copy-on-write that is
  exactly the delta's bytes, never the table. One InputPartition per
  group; executors read the group's parquet files with pyarrow and
  yield Arrow batches (zero row-by-row Python). Planning reads the RAW
  delta manifests (add/remove lists) directly — O(delta) per batch, no
  O(#groups) state resolution — which also lets a restarted stream
  resume past versions that ``expire_history`` has since deleted: the
  committed offset's own manifest is never read, only the deltas after
  it. Offset polling probes forward from the last known version
  (O(new commits) per trigger, not an O(#versions) directory listing).
- **Maintenance commits are skipped.** ``compact``/``optimize_zorder``
  mark their manifests ``data_change: false`` (row-identical relayout);
  the source emits nothing for them — the Delta dataChange contract
  that makes compaction usable on streamed ingest tables.
- **Schema changes fail the stream loudly.** A commit that widens the
  schema past what this reader knows raises (silently continuing would
  drop the new column's values from the feed); restarting the stream
  picks up the new schema and the same version replays cleanly from
  the checkpoint. Narrower historical schemas (a from-zero replay
  crossing the table's own evolution) null-fill and pass.
- **Backpressure.** ``maxVersionsPerBatch=N`` caps how many commits one
  micro-batch covers (the version-grained maxFilesPerTrigger), so a
  ``startingVersion=0`` replay of a long history arrives as bounded
  batches; the cap's high-water mark follows the engine's own planned/
  committed offsets, so it survives checkpoint restarts.
- **Append-only discipline, declared.** Like Delta's source, a commit
  that REWRITES data (merge touching existing groups, delete, compact,
  optimize) is not representable as an append stream; the source
  raises unless ``ignoreChanges=true``, in which case rewritten groups
  are re-emitted (downstream must dedupe — the documented Delta
  ignoreChanges contract). Blind appends and create stream cleanly.

Batch reads (``spark.read.format("ledger")``) are provided for API
completeness and read the latest snapshot the same way; prefer
``ledger.read()`` for batch work — it plans a native JVM parquet scan
(manifest-pruned, codegen) while this path moves bytes through
Python+Arrow, which only makes sense when micro-batch deltas are small.

Exactly-once: Spark's streaming engine checkpoints the version offsets;
re-delivered batches re-read the same immutable groups (manifests and
groups are never mutated), so the feed is deterministic. Pair with
streaming/ledger_sink.py's txn-id MERGE for end-to-end exactly-once
ledger->ledger pipelines.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import ledger

# Ops whose commit only ADDS rows (never rewrites an existing group).
_APPEND_OPS = {"create", "append"}


@dataclass
class _GroupPartition(InputPartition):
    """One ledger file group; `files` are absolute parquet paths and
    `arrow_schema` the expected Arrow schema (pyarrow schemas pickle) —
    pre-evolution files may lack trailing columns, which the reader
    null-fills, and every batch is cast to this schema so Spark's Arrow
    deserializer sees exactly the declared source types."""

    files: list
    arrow_schema: object


def _arrow_schema(schema: StructType):
    """Spark schema -> Arrow schema, the same mapping Spark's own Arrow
    path uses (session tz pinned to UTC in session.py)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    try:
        return to_arrow_schema(schema, timezone="UTC")
    except TypeError:  # older signature without timezone
        return to_arrow_schema(schema)


def _group_files(table: str, group: dict) -> list:
    root = os.path.join(table, group["path"])
    return [
        os.path.join(root, f)
        for f in sorted(os.listdir(root))
        if f.endswith(".parquet")
    ]


def _read_group_arrow(partition: _GroupPartition):
    """Yield Arrow batches for one group, null-filling columns the
    physical files predate (add-column schema evolution)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    want = partition.arrow_schema
    for path in partition.files:
        pf = pq.ParquetFile(path)
        have = set(pf.schema_arrow.names)
        for batch in pf.iter_batches(
            columns=[f.name for f in want if f.name in have]
        ):
            tbl = pa.Table.from_batches([batch])
            arrays = [
                tbl.column(f.name)
                if f.name in have
                else pa.nulls(len(tbl), type=f.type)
                for f in want
            ]
            out = pa.table(arrays, names=[f.name for f in want]).cast(
                want, safe=False
            )
            yield from out.to_batches()


class _LedgerBatchReader(DataSourceReader):
    def __init__(self, table: str, schema: StructType):
        manifest = ledger._read_manifest(
            table, ledger.latest_version(table)
        )
        arrow = _arrow_schema(schema)
        self._parts = [
            _GroupPartition(_group_files(table, g), arrow)
            for g in manifest["groups"]
        ]

    def partitions(self):
        return self._parts

    def read(self, partition):
        yield from _read_group_arrow(partition)


def _schema_fields(schema_json: dict) -> list:
    """(name, type) pairs for schema-change detection — nullability and
    metadata churn must not fail a stream."""
    import json as _json

    return [
        (f["name"], _json.dumps(f["type"], sort_keys=True))
        for f in schema_json["fields"]
    ]


class _LedgerStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, schema: StructType, options: dict):
        self._table = table
        self._arrow = _arrow_schema(schema)
        self._schema_fields = _schema_fields(schema.jsonValue())
        # Spark delivers reader options case-insensitively (keys arrive
        # lowercased) — normalize before lookup.
        opts = {str(k).lower(): v for k, v in options.items()}
        self._ignore_changes = (
            str(opts.get("ignorechanges", "false")).lower() == "true"
        )
        # An offset is the LAST PROCESSED version; batches cover
        # (start, end]. startingVersion=V means "include V's commit",
        # so the initial offset is V-1; default = latest (new commits
        # only, the Delta default).
        sv = opts.get("startingversion")
        self._start = (
            int(sv) - 1 if sv is not None else ledger.latest_version(table)
        )
        # Backpressure (maxFilesPerTrigger's version-grained analog):
        # cap how many COMMITS one micro-batch may cover, so a
        # startingVersion=0 replay of a long history arrives as bounded
        # batches instead of one giant first batch. 0/absent = no cap.
        self._max_versions = int(opts.get("maxversionsperbatch", 0))
        # The cap's base must be an ENGINE-authoritative offset or the
        # stream's own start. Measured engine behavior (probed, pyspark
        # 4.1): on a FRESH stream the first call is latestOffset —
        # before initialOffset — so the base falls back to self._start,
        # which IS the fresh stream's initial offset; on a checkpoint
        # RESTART the engine calls partitions(checkpointed, ...) to
        # recover the last batch BEFORE any latestOffset poll, so
        # _base is already the committed offset and a capped
        # latestOffset can never regress below it (regressing would
        # re-deliver committed versions).
        self._base: int | None = None

    def initialOffset(self):
        self._base = (
            self._start if self._base is None else max(self._base, self._start)
        )
        return {"version": self._start}

    def latestOffset(self):
        latest = self._probe_latest()
        if self._max_versions > 0:
            base = self._base if self._base is not None else self._start
            # _base advances only when a batch is actually planned or
            # committed (partitions/commit), so repeated polls return
            # the same capped offset — the cap is exact per batch.
            latest = min(latest, base + self._max_versions)
        return {"version": latest}

    def _probe_latest(self) -> int:
        """The table's latest version, O(new commits) per poll: probe
        forward from the last version this reader knows exists instead
        of listing the whole _ledger directory every trigger (which is
        O(#versions) on exactly the continuously-polled path)."""
        hint = self._base if self._base is not None else self._start
        if hint < 0 or not os.path.exists(
            os.path.join(
                ledger._ledger_path(self._table),
                ledger._manifest_name(hint),
            )
        ):
            # Unknown or already-expired base: one directory listing.
            v = ledger.latest_version(self._table)
        else:
            v = hint
        d = ledger._ledger_path(self._table)
        while os.path.exists(
            os.path.join(d, ledger._manifest_name(v + 1))
        ):
            v += 1
        return v

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        # The engine's offsets are authoritative (after a checkpoint
        # restart they resume PAST self._start) — they establish and
        # advance the backpressure base.
        self._base = hi if self._base is None else max(self._base, hi)
        parts = []
        legacy_from = None
        for v in range(lo + 1, hi + 1):
            raw = ledger._read_raw(self._table, v)
            if "groups" in raw and raw.get("parent") is not None:
                # Legacy full-snapshot manifest (pre-delta-format
                # table): fall back to resolved-set planning for the
                # whole interval.
                legacy_from = lo
                break
            if raw.get("schema") is not None and not (
                set(_schema_fields(raw["schema"]))
                <= set(self._schema_fields)
            ):
                # Delta's contract: a commit whose schema carries
                # fields this reader does not know fails the stream so
                # the operator restarts it — schema() then returns the
                # NEW schema and this same version replays cleanly.
                # Silently continuing would drop the new column's
                # values from the feed forever. NARROWER schemas (a
                # from-zero replay crossing its own create/evolution
                # history) pass: old files null-fill under the wider
                # reader schema.
                raise ledger.LedgerError(
                    f"streaming source: version {v} changed the table "
                    "schema; restart the stream to pick up the new "
                    "schema (offsets are checkpointed — no data is "
                    "lost or re-delivered)"
                )
            if raw.get("data_change", True) is False:
                continue  # row-identical relayout (compact/optimize)
            removes = raw.get("remove") or []
            if removes and not self._ignore_changes:
                # Behavior-based, not label-based: ANY commit that
                # drops a previously-visible group rewrote data, which
                # an append stream cannot represent (Delta's contract);
                # a pure-insert merge has no removes and streams
                # cleanly.
                raise ledger.LedgerError(
                    f"streaming source: version {v} ({raw['op']}) "
                    "rewrites existing data; set ignoreChanges=true "
                    "to re-emit rewritten groups (downstream must "
                    "dedupe)"
                )
            for g in raw.get("add") or (
                raw.get("groups") if "groups" in raw else []
            ):
                parts.append(
                    _GroupPartition(
                        _group_files(self._table, g), self._arrow
                    )
                )
        if legacy_from is None:
            return parts
        return self._partitions_resolved(legacy_from, hi)

    def _partitions_resolved(self, lo, hi):
        """Resolved-set planning for LEGACY full-manifest tables: the
        pre-r13 algorithm, O(#groups) per version. New-format tables
        never take this path — their deltas carry add/remove directly,
        which also lets a restarted stream resume past versions that
        expire_history has since deleted (the delta walk above never
        resolves the committed offset itself)."""
        parts = []
        emitted = (
            {
                g["path"]
                for g in ledger._read_manifest(self._table, lo)["groups"]
            }
            if lo >= 0
            else set()
        )
        for v in range(lo + 1, hi + 1):
            m = ledger._read_manifest(self._table, v)
            # Same stream contracts as the delta path above: one legacy
            # full-snapshot manifest in a window must not let a later
            # schema widening pass silently or a compact/optimize in
            # the same window raise (or, with ignoreChanges, re-emit).
            if m.get("schema") is not None and not (
                set(_schema_fields(m["schema"]))
                <= set(self._schema_fields)
            ):
                raise ledger.LedgerError(
                    f"streaming source: version {v} changed the table "
                    "schema; restart the stream to pick up the new "
                    "schema (offsets are checkpointed — no data is "
                    "lost or re-delivered)"
                )
            if m.get("data_change", True) is False:
                # (data_change rides the resolved state: every resolved
                # constructor copies per-version extras, so no second
                # _read_raw — which a concurrent expire could invalidate.)
                # Row-identical relayout: its output groups carry only
                # already-delivered rows. RESET emitted to the current
                # group set — the new paths count as delivered, and the
                # compacted-away paths must drop out (group paths are
                # never reused, so a stale entry would only make a later
                # pure-insert merge falsely read as a rewrite).
                emitted = {g["path"] for g in m["groups"]}
                continue
            if m["op"] not in _APPEND_OPS and not self._ignore_changes:
                replaced = emitted - {g["path"] for g in m["groups"]}
                if replaced:
                    raise ledger.LedgerError(
                        f"streaming source: version {v} ({m['op']}) "
                        "rewrites existing data; set ignoreChanges=true "
                        "to re-emit rewritten groups (downstream must "
                        "dedupe)"
                    )
            for g in m["groups"]:
                if g["path"] not in emitted:
                    emitted.add(g["path"])
                    parts.append(
                        _GroupPartition(
                            _group_files(self._table, g), self._arrow
                        )
                    )
        return parts

    def read(self, partition):
        yield from _read_group_arrow(partition)

    def commit(self, end):
        # Offsets live in Spark's checkpoint; manifests are immutable.
        # Track the committed high-water mark for the backpressure cap.
        v = end["version"]
        self._base = v if self._base is None else max(self._base, v)

    def stop(self):
        pass


def register_ledger_source(spark) -> None:
    """Register ``format("ledger")`` with this session. Python data
    sources are PICKLED into python workers (planning AND reads both
    run there), so the class must not be pickled by module reference —
    the workers' sys.path need not include this repo. Registering the
    two ledger modules for by-value pickling makes the source
    self-contained wherever the session runs."""
    # Spark serializes data sources with its VENDORED cloudpickle
    # (pyspark.cloudpickle), not the standalone package — registering
    # with the wrong one is a silent no-op.
    from pyspark import cloudpickle

    from . import ledger as _ledger_mod

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(_ledger_mod)
    spark.dataSource.register(LedgerDataSource)


class LedgerDataSource(DataSource):
    """Register via ``register_ledger_source(spark)``, then
    ``spark.readStream.format("ledger").load(table_path)``."""

    @classmethod
    def name(cls):
        return "ledger"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ledger.LedgerError(
                "ledger source needs a table path: .load('/path/to/table')"
            )
        return path

    def schema(self):
        manifest = ledger._read_manifest(
            self._table(), ledger.latest_version(self._table())
        )
        return StructType.fromJson(manifest["schema"])

    def reader(self, schema):
        return _LedgerBatchReader(self._table(), schema)

    def streamReader(self, schema):
        return _LedgerStreamReader(self._table(), schema, dict(self.options))
