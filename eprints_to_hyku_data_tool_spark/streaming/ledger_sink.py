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
propagates and fails the stream; the restart re-delivers the batch and
the idempotence check decides whether it already landed. State is
bounded: the sink holds nothing between batches — recovery state IS the
table's manifest history.

Source contract: each micro-batch must be key-unique (one change per
key per batch — the CDC "latest change wins per batch" compaction from
streaming_cdc_apply produces exactly this); ledger.merge rejects
duplicate keys loudly rather than applying them in arbitrary order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources import ledger


def merge_batch(
    table: str, batch_df: DataFrame, batch_id: int, txn_app: str
) -> int | None:
    """Apply one micro-batch as a transactional MERGE; returns the
    committed version, or None if this batch id already landed under
    `txn_app` (checkpoint-recovery re-delivery)."""
    last = ledger.latest_txn(table, txn_app)
    if last is not None and batch_id <= last:
        return None
    return ledger.merge(
        batch_df.sparkSession,
        table,
        batch_df,
        txn={"app": txn_app, "batch": batch_id},
    )


def merge_stream(
    stream: DataFrame, table: str, checkpoint_dir: str, txn_app: str
):
    """writeStream into a ledger table with exactly-once upserts: wire
    `merge_batch` through foreachBatch. Caller starts the returned
    writer (``.start()``) and owns the checkpoint dir."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_batch(table, df, bid, txn_app)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
