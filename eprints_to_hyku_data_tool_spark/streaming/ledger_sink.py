"""Exactly-once streaming upsert into a ledger table (sources/ledger.py).

The batch side of the migration has MERGE on storage (x91); a live
ingest needs the same thing fed by a stream: every micro-batch of
changed records upserts into the serving table, and a crash/restart
must not double-apply a batch. Structured Streaming's contract is
at-least-once delivery into foreachBatch — after checkpoint recovery
the LAST batch is re-delivered with the SAME batch_id — so exactly-once
is achieved the way the production formats do it: the sink records its
transactional identity (app id, batch id) in the committed manifest,
and on re-delivery a batch id at or below the last committed one is
skipped (``ledger.latest_txn``). Commit + txn record are one atomic
manifest publish, so there is no window where data landed but the batch
id did not.

Concurrency: a ConcurrentCommitError (another writer raced this table)
loops the sink back to RE-READ latest_txn before re-attempting — the
idempotence check and the commit form one optimistic transaction, so a
zombie driver that applied this very batch in the race window is
detected instead of double-applied; only a persistent race (attempts
exhausted) fails the stream. Recovery state IS the table's manifest
history (the in-process high-water cache is an optimization only).

Source contract: each micro-batch must be key-unique (one change per
key per batch — the CDC "latest change wins per batch" compaction from
streaming_cdc_apply produces exactly this); ledger.merge rejects
duplicate keys loudly rather than applying them in arbitrary order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources import ledger


def merge_batch(
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    txn_app: str,
    attempts: int = 5,
) -> int | None:
    """Apply one micro-batch as a transactional MERGE; returns the
    committed version, or None if this batch id already landed under
    `txn_app` (checkpoint-recovery re-delivery).

    The idempotence check is enforced INSIDE the commit attempt, not
    just here: ledger.merge re-validates the txn against the exact
    parent it links onto (TxnAlreadyApplied) — a pre-flight-only check
    was a TOCTOU (code-review r14): a zombie driver whose latest_txn
    read passed before it stalled would wake, see no version collision
    (its merge re-reads the NEWEST parent), and re-apply stale batch
    data ON TOP of newer commits. The latest_txn read below is now only
    a cheap short-circuit; correctness rests on the in-commit guard.

    Checkpoint-reset footgun (the Delta txnAppId contract, documented
    here too): micro-batch ids are per-CHECKPOINT. Restarting a stream
    with a wiped/new checkpoint dir under the SAME txn_app restarts
    batch ids at 0 while the table's high-water stays at the old value
    — every batch is skipped as a re-delivery until ids catch up,
    silently dropping data. Pair every new checkpoint dir with a new
    txn_app (or expire the old txn by rebuilding the table). A reset
    signature (batch 0 against a positive high-water) is warned loudly."""
    import sys as _sys

    for _ in range(attempts):
        last = ledger.latest_txn(table, txn_app)
        if last is not None and batch_id <= last:
            if batch_id == 0 and last > 0:
                print(
                    f"ledger_sink WARNING: batch 0 for txn_app "
                    f"{txn_app!r} but {table} records high-water "
                    f"{last} — if this stream's checkpoint dir was "
                    "reset, every batch up to that id will be "
                    "SKIPPED as a re-delivery; use a fresh txn_app "
                    "with a fresh checkpoint",
                    file=_sys.stderr,
                )
            return None
        try:
            return ledger.merge(
                batch_df.sparkSession,
                table,
                batch_df,
                txn={"app": txn_app, "batch": batch_id},
                retries=0,
            )
        except ledger.TxnAlreadyApplied:
            return None  # raced by our own zombie/restart: already landed
        except ledger.ConcurrentCommitError:
            continue  # the racer may have been OUR zombie: re-check
    raise ledger.ConcurrentCommitError(
        f"merge_batch: {attempts} straight version races on {table}"
    )


def merge_stream(
    stream: DataFrame, table: str, checkpoint_dir: str, txn_app: str
):
    """writeStream into a ledger table with exactly-once upserts: wire
    `merge_batch` through foreachBatch. Caller starts the returned
    writer (``.start()``) and owns the checkpoint dir.

    A closure-cached high-water mark short-circuits the storage-side
    latest_txn lookup for batch ids already known applied in THIS
    process; the first batch after any (re)start still consults
    storage. Since the r13 metadata plane, that storage lookup is
    itself O(CHECKPOINT_INTERVAL) — checkpoints carry the accumulated
    per-app txn map — so the cache is a micro-optimization, not the
    thing standing between the sink and an O(versions^2) stream."""
    hwm: dict = {"last": None}

    def apply(df: DataFrame, bid: int) -> None:
        if hwm["last"] is not None and bid <= hwm["last"]:
            return
        merge_batch(table, df, bid, txn_app)
        hwm["last"] = bid

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
