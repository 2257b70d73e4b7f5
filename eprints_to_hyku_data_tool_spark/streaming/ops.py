"""Structured Streaming operators: SURVEY.md §2.9 X07-X11.

The reference repo has no code (SURVEY.md §0). The driver's oracle cannot
check streams, so these are library functions over an unbounded events
DataFrame; tests/test_streaming.py replays the static events fixture
through a file source in chunks and asserts each stream's final state
equals its batch-equivalent query (Q54's shape etc.).

Scale posture: all stateful operators carry watermarks so state is
bounded and evictable; state lives in the executor-local state store
(RocksDB on a real cluster) keyed by the grouping key — the same
partitioning as the equivalent batch shuffle.
"""

from __future__ import annotations

# streaming_neardup per-bucket state ceiling (module-level so tests can
# patch it down to exercise the eviction arm). At the cap a bucket
# drops its OLDEST members (counted in state as n_evicted) rather than
# raising — see the policy comment inside streaming_neardup.
NEARDUP_MAX_BUCKET_MEMBERS = 10_000

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Schema of the replayed events stream (ts already converted to
# TimestampType by the replay writer — the ns->us conversion happens when
# the replay chunks are written, mirroring sources.tables.load_table).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """X07: file-source stream over a directory of parquet chunks.

    One chunk per micro-batch (maxFilesPerTrigger=1) so event-time
    progresses deterministically through the replay.
    """
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Q54's shape as a stream: watermarked 6-hour tumbling windows.

    Watermark bounds state: windows older than (max event time - watermark)
    are finalized and evicted.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedupe(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """X09: drop duplicate event_ids arriving within the watermark horizon.

    dropDuplicatesWithinWatermark keeps state only for the watermark
    window — bounded, unlike a plain dropDuplicates on a stream.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_join(stream: DataFrame, static_dim: DataFrame) -> DataFrame:
    """X10: enrich a stream against a static dimension (broadcast per
    micro-batch; no state needed for stream-static inner joins)."""
    return stream.join(
        F.broadcast(static_dim),
        stream.user_id == static_dim.c_custkey,
        "inner",
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def windowed_with_watermark(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """X08: append-mode windowed counts — a window is emitted only once its
    end has passed the watermark; events later than the watermark horizon
    are DROPPED (tested with a crafted late chunk)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Q56's shape as a stream: watermarked per-user session windows
    (30-minute gap). Append mode emits a session once the watermark
    passes its end — sessions still open within the watermark horizon at
    end-of-replay are withheld, which the replay test accounts for."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stateful_user_counter(stream: DataFrame) -> DataFrame:
    """X11: custom stateful processing — running per-user event counters
    via applyInPandasWithState (state: one (count, total_value) pair per
    user). NoTimeout here: processing-time timeouts stall availableNow
    replays (the trigger would have to wait out the wall-clock timeout);
    production eviction would key the timeout off the event-time watermark
    (EventTimeTimeout) instead."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, tv double"

    def update(key, pdfs, state: GroupState):
        n, tv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tv += float(pdf["value"].sum())
        state.update((n, tv))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [tv]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def purchase_click_join(stream: DataFrame, watermark: str = "3 hours") -> DataFrame:
    """X20 as a true stream-stream inner join: purchases matched to the
    same user's clicks in the preceding 2 hours.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can evict buffered rows once the watermark passes
    the interval: click state older than (purchase watermark - 2h) and
    purchase state older than the click watermark can never match again.
    Without the time-range condition the state store would grow without
    bound — this is the canonical stream-stream join discipline.
    """
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        "purchase_ts",
        "click_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


# Schema of a replayed documents stream (matches the documents fixture).
DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def docs_stream(spark: SparkSession, replay_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of documents parquet chunks."""
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )


def _restore_neardup_bucket(got_ids, got_shs, n_evicted, cap):
    """Rebuild a neardup bucket's working state from its persisted value:
    (ids deque, shingle-set deque, membership set, eviction count).

    Deduplicates on restore (code-review r15, second pass): a checkpoint
    written by the pre-keep-first code can hold a doc_id TWICE — a
    membership set built as set(ids) would then desync from the deque
    when the cap-eviction pops one copy (member.discard removes the id
    while its second copy survives), letting a later redelivery match
    against the surviving copy and emit a self-pair (X, X) into the
    append sink. Keep-first here makes the `one entry per doc_id`
    invariant hold for every state the operator can observe, new or
    legacy; the matching loop needs no self-pair guard because a
    processed doc_id is never in the bucket.

    The cap is applied after the dedupe (oldest-first, counted), so a
    legacy over-cap bucket is bounded before this trigger does any
    matching work."""
    from collections import deque

    ids: deque = deque()
    shs: deque = deque()
    member: set = set()
    n_evicted = int(n_evicted or 0)
    for i, s in zip(got_ids, got_shs):
        i = int(i)
        if i in member:
            continue
        ids.append(i)
        shs.append(frozenset(s))
        member.add(i)
    while len(ids) > cap:
        member.discard(ids.popleft())
        shs.popleft()
        n_evicted += 1
    return ids, shs, member, n_evicted


def streaming_neardup(stream: DataFrame) -> DataFrame:
    """Streaming near-duplicate detection: the q60/x17 MinHash-LSH family
    as an INCREMENTAL operator — every arriving document is checked
    against all previously seen documents, emitting each qualifying
    (id_a, id_b, inter_size, union_size) pair exactly when its second
    member arrives. The emitted pair set over a full replay equals the
    batch x17/q60 result, independent of arrival order (asserted in
    tests/test_streaming.py).

    Shape: signatures and band hashes are computed ROW-LOCALLY (array
    HOFs over the shingle set — no shuffle), then one explode per band
    and a groupBy (band, band_hash) feeds applyInPandasWithState whose
    state is this bucket's (doc_id, shingle-set) history. Exact Jaccard
    verification happens in-state; a pair colliding in k bands is
    emitted once per band — consumers dedupe on the pair key (set
    semantics or a downstream dropDuplicates; chaining the state-store
    dedupe directly after applyInPandasWithState trips a
    ColumnarBatchRow->UnsafeRow cast defect in Spark 4.1, so the
    operator does not bake it in).

    State discipline: bucket state grows with the corpus — the
    streaming analogue of the batch join needing both sides. Production
    deployments bound it the same way the batch path bounds work: evict
    by event-time watermark (GroupStateTimeout.EventTimeTimeout) when
    near-dups are only sought within a time horizon. NoTimeout is used
    here because availableNow replays stall on processing-time
    timeouts (same rationale as stateful_user_counter)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..plans.q_north import (
        N_BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        TAU_DEN,
        TAU_NUM,
        shingle_expr,
    )

    toks = stream.select("doc_id", F.split("text", " ").alias("toks"))
    # Docs with fewer than SHINGLE_K tokens have an EMPTY shingle set:
    # every array_min minhash is NULL, xxhash64 skips NULL children, so
    # ALL such docs would share one band hash per band and the state
    # kernel's 5*0 >= 4*0 check would emit degenerate (0,0) pairs — the
    # batch path (q_north) drops shingle-less docs before banding, and
    # the stream must match it.
    sh = toks.select(
        "doc_id", shingle_expr(F.col("toks")).alias("sh")
    ).filter(F.size("sh") > 0)
    # Row-local minhash: min over the shingle array per seed (the batch
    # path explodes + groupBys for shuffle locality; a stream avoids the
    # shuffle entirely). The string is hashed ONCE into a projected
    # base-hash array; the 64 per-seed minhashes re-hash the fixed
    # 8-byte base — the same one-string-hash-per-shingle shape the
    # batch path measured as the hot-spot fix (string bytes dominate
    # xxhash64 cost; 64 independent lambdas defeat subexpression
    # elimination, so the sharing must be an explicit projection).
    based = sh.select(
        "doc_id",
        "sh",
        F.transform("sh", lambda s: F.xxhash64(s)).alias("bh"),
    )
    sig = based.select(
        "doc_id",
        "sh",
        *[
            F.array_min(
                F.transform("bh", lambda b: F.xxhash64(b, F.lit(seed)))
            ).alias(f"h{seed}")
            for seed in range(N_HASHES)
        ],
    )
    bands = sig.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"h{b * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                        F.lit(b),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )

    out_schema = "id_a bigint, id_b bigint, inter_size int, union_size int"
    state_schema = (
        "ids array<bigint>, shs array<array<string>>, n_evicted bigint"
    )

    # Per-bucket membership ceiling (code-review r14, advice r15): a hot
    # bucket (template/boilerplate docs sharing a band hash) accumulates
    # every member's full shingle set in ONE state-store value forever
    # (NoTimeout), each arrival does O(members) intersections, and the
    # whole O(members) value re-serializes per trigger — O(N^2)
    # cumulative work and an eventually serialization-breaking row. At
    # the cap the bucket EVICTS its oldest members (FIFO = arrival
    # order) instead of raising: a hot-template corpus degrades to a
    # member-count dedupe horizon — pairs against evicted members are
    # missed, which is the same contract as the event-time horizon a
    # watermark + EventTimeTimeout deployment would choose, just keyed
    # by recency rank instead of event time. The eviction runs INSIDE
    # the per-document append loop (advice r15: a cap checked only at
    # state load lets one hot micro-batch grow the bucket arbitrarily
    # far past the ceiling, and the oversized state.update can fail on
    # serialization before the next trigger ever sees it), so both the
    # stored state AND the per-arrival intersection work are bounded by
    # the cap throughout. The cumulative eviction count is carried in
    # state (n_evicted) — on a real cluster the state source
    # (spark.read.format("statestore")) reads it per bucket, turning
    # silent degradation into a monitorable metric; the batch-equality
    # contract holds exactly when every bucket's max(n_evicted) == 0.
    cap = NEARDUP_MAX_BUCKET_MEMBERS

    def update(key, pdfs, state: GroupState):
        if state.exists:
            got_ids, got_shs, n_evicted = state.get
        else:
            got_ids, got_shs, n_evicted = [], [], 0
        ids, shs, member, n_evicted = _restore_neardup_bucket(
            got_ids, got_shs, n_evicted, cap
        )
        out = {"id_a": [], "id_b": [], "inter_size": [], "union_size": []}
        for pdf in pdfs:
            for doc_id, sh_arr in zip(pdf["doc_id"], pdf["sh"]):
                doc_id = int(doc_id)
                # Re-delivered doc_id (duplicate/corrected upstream
                # record): keep-first, matching the batch path where
                # each doc contributes one row. Without this, a second
                # copy re-emits every qualifying pair into the APPEND
                # sink and its append evicts a DISTINCT older member at
                # the cap (code-review r15).
                if doc_id in member:
                    continue
                cur = frozenset(sh_arr)
                for prev_id, prev_sh in zip(ids, shs):
                    inter = len(cur & prev_sh)
                    union = len(cur) + len(prev_sh) - inter
                    if TAU_DEN * inter >= TAU_NUM * union:
                        a, b = sorted((prev_id, doc_id))
                        out["id_a"].append(a)
                        out["id_b"].append(b)
                        out["inter_size"].append(inter)
                        out["union_size"].append(union)
                ids.append(doc_id)
                shs.append(cur)
                member.add(doc_id)
                if len(ids) > cap:  # one append past cap -> evict one
                    member.discard(ids.popleft())
                    shs.popleft()
                    n_evicted += 1
        state.update((list(ids), [list(s) for s in shs], n_evicted))
        yield pd.DataFrame(out).astype(
            {"id_a": "int64", "id_b": "int64",
             "inter_size": "int32", "union_size": "int32"}
        )

    return bands.groupBy("band", "band_hash").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_countmin(stream: DataFrame) -> DataFrame:
    """Incremental count-min sketch maintenance (y50's sketch as a
    stream): each event fans into D (hash-row, bucket) cells via the
    same Carter-Wegman stack() expression the batch query uses, and an
    UNWATERMARKED streaming aggregate keeps the per-cell counters. Run
    it in COMPLETE mode (as the equality test does): every micro-batch
    re-emits the full D x W counter table, which a memory/table sink
    overwrites wholesale. Update mode would emit only revised cells and
    requires a sink that upserts on (h, bucket) — an append-only sink
    would accumulate stale versions of re-emitted cells.

    State size is the sketch itself (D x W = 2048 counters), CONSTANT in
    stream length — the whole point of sketching a stream: no watermark
    is needed because the state never grows, unlike the windowed aggs
    (X08) where the watermark is what bounds state.
    tests/test_streaming.py proves the replayed sketch is identical,
    cell for cell, to the batch y50 sketch over the same events.
    """
    from ..plans.q_aggs import _CMS_SEEDS, _cms_bucket_sql

    cells = ", ".join(
        f"{h}, {_cms_bucket_sql('user_id', a, b)}" for h, a, b in _CMS_SEEDS
    )
    return (
        stream.select(
            F.expr(f"stack({len(_CMS_SEEDS)}, {cells}) AS (h, bucket)")
        )
        .groupBy("h", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def streaming_ewma(stream: DataFrame, alpha_num: int = 1, alpha_den: int = 4) -> DataFrame:
    """Streaming EWMA (q36's incremental form): per-user state is ONE
    scalar (plus the order cursor), updated as 0.75*prev + 0.25*x per
    event — the state never grows with the history, which is the whole
    point of the streaming variant vs the batch ordered fold. Rows
    inside a micro-batch are sorted by (ts, event_id) before folding and
    batches replay in time order, so the multiply-add sequence is
    IDENTICAL to batch q36 — the replay test asserts bit-equality, not
    a tolerance. Emits the running (user_id, n_events, ewma_u) after
    every trigger (update mode).

    Ordered-delivery CONTRACT, enforced (code-review r14): EWMA is an
    order-sensitive fold, so an event arriving one trigger later than an
    event-time-newer event would silently corrupt the state forever —
    the sort only fixes ordering WITHIN a batch. The state carries the
    per-user event-time cursor and RAISES on a cross-batch regression
    instead of folding out of order; the production fix for genuinely
    out-of-order sources is watermarked buffering (hold events in state,
    fold in event-time order when the watermark passes), which costs
    O(buffer) state this constant-state variant exists to avoid."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    alpha = alpha_num / alpha_den
    beta = 1.0 - alpha
    output_schema = "user_id bigint, n_events bigint, ewma_u double"
    state_schema = "n bigint, ewma double, last_us bigint, last_id bigint"

    def update(key, pdfs, state: GroupState):
        import math

        n, ewma, last_us, last_id = (
            state.get if state.exists else (0, 0.0, -(1 << 63), -(1 << 63))
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts, eid, v in zip(rows["ts"], rows["event_id"], rows["value"]):
            cur_us = int(pd.Timestamp(ts).value // 1000)
            if (cur_us, int(eid)) <= (last_us, last_id):
                raise ValueError(
                    f"streaming_ewma: out-of-order delivery for user "
                    f"{key[0]} — event ({ts}, {eid}) arrived after the "
                    f"fold cursor ({last_us}us, {last_id}); EWMA is an "
                    "order-sensitive fold and folding late data would "
                    "silently corrupt the state. Feed this operator an "
                    "in-order source, or buffer with a watermark."
                )
            last_us, last_id = cur_us, int(eid)
            # math.floor, not int(): the batch q36 quantizes with
            # floor(v*1e6+0.5) and int() truncates toward zero, which
            # diverges for negative values (ADVICE r5).
            x = float(math.floor(v * 1e6 + 0.5))
            ewma = x if n == 0 else ewma * beta + x * alpha
            n += 1
        state.update((n, ewma, last_us, last_id))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_u": [ewma]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_cdc_apply(stream: DataFrame) -> DataFrame:
    """Streaming CDC upsert compaction (q31's incremental form): per-key
    state is the latest (ts, event_id, value, op) plus an op counter;
    'error' rows are tombstones. Each trigger emits the key's current
    final state with a deleted flag — exactly the per-micro-batch apply
    a lakehouse MERGE-on-read performs. State is O(1) per key; the
    replay test asserts the end state equals the batch q31 result."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = (
        "user_id bigint, applied_ts_us bigint, final_value_u bigint, "
        "n_ops bigint, is_deleted boolean"
    )
    state_schema = "ts_us bigint, event_id bigint, value_u bigint, n bigint, deleted boolean"

    def update(key, pdfs, state: GroupState):
        import math

        if state.exists:
            ts_us, event_id, value_u, n, deleted = state.get
        else:
            ts_us, event_id, value_u, n, deleted = -1, -1, 0, 0, False
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for _, r in rows.iterrows():
            t = int(r["ts"].value // 1000)  # ns -> us
            e = int(r["event_id"])
            n += 1
            if (t, e) > (ts_us, event_id):
                ts_us, event_id = t, e
                deleted = r["event_type"] == "error"
                # floor-based quantization, matching batch q31
                # exactly for negatives too (ADVICE r5)
                value_u = math.floor(r["value"] * 1e6 + 0.5)
        state.update((ts_us, event_id, value_u, n, deleted))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "applied_ts_us": [ts_us],
                "final_value_u": [value_u],
                "n_ops": [n],
                "is_deleted": [deleted],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# The applyInPandasWithState closures above now reference module-level
# helpers (_restore_neardup_bucket); cloudpickle serializes module-level
# functions BY REFERENCE, which would require this package on every
# executor's sys.path. Registering the module for by-value pickling
# ships the (dependency-free) helpers inside the task closure instead —
# same treatment as functions/multimodal.py, and it must use Spark's
# VENDORED cloudpickle (the standalone package's registration is a
# silent no-op for Spark's pickler).
import sys as _sys  # noqa: E402

try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - older pickle layouts
    pass
