"""Streaming replay tests (SURVEY.md §5 item 4): feed the static events
fixture through a file-source stream in time-ordered chunks and assert the
final streaming state equals the batch-equivalent query."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all
from eprints_to_hyku_data_tool_spark.sources.tables import load_table
from eprints_to_hyku_data_tool_spark.streaming import ops

_load_all()

N_CHUNKS = 4


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    """events (sf fixture) written as N_CHUNKS time-ordered parquet files."""
    tmp = tempfile.mkdtemp(prefix="events_replay_")
    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows = ev.count()
    per = rows // N_CHUNKS + 1
    pdf = ev.toPandas()
    for i in range(N_CHUNKS):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        if len(chunk):
            spark.createDataFrame(
                chunk, schema=ops.EVENTS_STREAM_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/chunk={i}")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_to_memory(df, name: str, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def _chunks_glob(replay_dir: str) -> str:
    return f"{replay_dir}/chunk=*"


def test_x07_tumbling_stream_equals_batch(spark, sf_dir, replay_dir):
    """X07+Q54: streamed watermarked tumbling agg == batch Q54 (in-order
    replay drops nothing)."""
    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.tumbling_counts(stream), name, "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in REGISTRY["z10654_tumbling_window"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_x09_streaming_dedupe(spark, sf_dir, replay_dir, tmp_path):
    """X09: duplicated chunk replayed twice -> dropDuplicatesWithinWatermark
    emits each event_id once."""
    dup_dir = str(tmp_path / "dup")
    src = spark.read.parquet(_chunks_glob(replay_dir))
    src.coalesce(1).write.mode("overwrite").parquet(f"{dup_dir}/a")
    src.coalesce(1).write.mode("overwrite").parquet(f"{dup_dir}/b")
    name = f"d_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, f"{dup_dir}/*", max_files_per_trigger=1)
    _run_to_memory(ops.streaming_dedupe(stream), name, "append")
    out = spark.table(name)
    n_distinct_ids = out.select("event_id").distinct().count()
    assert out.count() == n_distinct_ids == src.select("event_id").distinct().count()


def test_x10_stream_static_join(spark, sf_dir, replay_dir):
    """X10: stream-static join row count == batch join row count."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    name = f"j_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.stream_static_join(stream, cust), name, "append")
    got = spark.table(name).count()
    ev = load_table(spark, sf_dir, "events")
    want = ev.join(cust, ev.user_id == cust.c_custkey, "inner").count()
    assert got == want > 0


def test_x08_watermark_drops_late(spark, replay_dir, tmp_path):
    """X08: an event arriving >1h behind the observed max event time, in a
    later micro-batch, is dropped from append-mode windowed counts."""
    import pandas as pd

    import time

    late_dir = str(tmp_path / "late")
    src = spark.read.parquet(_chunks_glob(replay_dir)).orderBy("ts", "event_id")
    pdf = src.toPandas()
    third = len(pdf) // 3
    c0, c1, c2 = pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :].copy()
    # Craft one late row whose whole 6-hour WINDOW ended long before the
    # watermark (rows are dropped once window.end < watermark): 30h before
    # the max ts of chunk 0, arriving two micro-batches later (the engine
    # applies an updated watermark with one batch of lag).
    late_row = c0.iloc[[0]].copy()
    late_row["ts"] = c0["ts"].max() - pd.Timedelta(hours=30)
    late_row["event_id"] = 10_000_000
    c2 = pd.concat([late_row, c2], ignore_index=True)
    for i, chunk in enumerate((c0, c1, c2)):
        spark.createDataFrame(chunk, schema=ops.EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(f"{late_dir}/c={i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    name = f"w_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, f"{late_dir}/*", max_files_per_trigger=1)
    _run_to_memory(ops.windowed_with_watermark(stream, "1 hour"), name, "append")
    streamed = {
        r["window_start"]: r["n_events"] for r in spark.table(name).collect()
    }

    # Batch totals WITHOUT the late row = what the stream should emit for
    # the late row's window (late row dropped).
    batch = (
        spark.read.parquet(f"{late_dir}/*")
        .filter(F.col("event_id") != 10_000_000)
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    late_window = [
        r["ws"]
        for r in batch.collect()
        if r["ws"] <= late_row["ts"].iloc[0].to_pydatetime()
        and late_row["ts"].iloc[0].to_pydatetime() - r["ws"] <
        __import__("datetime").timedelta(hours=6)
    ][0]
    want_n = {r["ws"]: r["n"] for r in batch.collect()}[late_window]
    # Append mode only emits finalized windows; the late window must have
    # been finalized with the no-late-row count.
    assert streamed.get(late_window) == want_n


def test_q56_session_stream_matches_batch(spark, sf_dir, replay_dir):
    """Streamed session windows == batch q56 for every session the
    watermark finalized (append mode withholds sessions still open within
    the horizon at end-of-replay)."""
    import datetime

    name = f"sw_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.session_counts(stream, "1 hour"), name, "append")
    streamed = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table(name).collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in REGISTRY["z10656_session_window"].fn(spark, sf_dir).collect()
    }
    assert set(streamed) <= set(batch)
    for key, val in streamed.items():
        assert batch[key] == val
    # everything the watermark could finalize was emitted: sessions ending
    # more than (watermark + one batch of lag) before max event time
    max_ts = max(end for end, _ in batch.values())
    horizon = max_ts - datetime.timedelta(hours=2)
    finalized = {k for k, (end, _) in batch.items() if end < horizon}
    assert finalized <= set(streamed)


def test_x11_stateful_counter(spark, sf_dir, replay_dir):
    """X11: applyInPandasWithState running per-user counters — final state
    equals batch per-user counts."""
    name = f"s_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.stateful_user_counter(stream), name, "update")
    out = spark.table(name).toPandas()
    # update mode re-emits rows per batch: keep the LAST emission per user
    final = out.groupby("user_id").last()
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .set_index("user_id")["n_events"]
    )
    assert final["n_events"].to_dict() == want.to_dict()


def test_x20_stream_stream_join_equals_batch(spark, sf_dir, replay_dir):
    """X20: stream-stream interval join (two watermarks, bounded state)
    replayed in-order == the batch interval join."""
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.purchase_click_join(stream), name, "append")
    got = {
        (r["purchase_id"], r["click_id"], r["lag_us"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["purchase_id"], r["click_id"], r["lag_us"])
        for r in REGISTRY["z12789_interval_join"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def docs_replay_dir(spark, sf_dir):
    """documents fixture written as N_CHUNKS parquet files (id order — the
    operator's result must be arrival-order independent anyway)."""
    tmp = tempfile.mkdtemp(prefix="docs_replay_")
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    pdf = docs.toPandas()
    per = len(pdf) // N_CHUNKS + 1
    for i in range(N_CHUNKS):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        if len(chunk):
            spark.createDataFrame(
                chunk, schema=ops.DOCS_STREAM_SCHEMA
            ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/chunk={i}")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_neardup_equals_batch(spark, sf_dir, docs_replay_dir):
    """Streaming MinHash-LSH near-dup (stateful, incremental) over a full
    replay emits exactly the batch x17/q60 pair set with exact sizes."""
    name = f"nd_{uuid.uuid4().hex[:8]}"
    stream = ops.docs_stream(spark, _chunks_glob(docs_replay_dir))
    _run_to_memory(ops.streaming_neardup(stream), name, "append")
    got = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in REGISTRY["z12786_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_countmin_equals_batch_sketch(spark, sf_dir, replay_dir):
    """Incremental CMS maintenance: replaying the event chunks through the
    unwatermarked sketch aggregate must land on EXACTLY the batch y50
    sketch (integer counters, Carter-Wegman hashes — no tolerance
    needed). State is the 2048-cell sketch itself, constant in stream
    length."""
    from eprints_to_hyku_data_tool_spark.plans.q_aggs import (
        _CMS_SEEDS,
        _cms_bucket_sql,
    )

    name = f"cms_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.streaming_countmin(stream), name, "complete")
    got = {
        (r["h"], r["bucket"]): r["cnt"] for r in spark.table(name).collect()
    }
    cells = ", ".join(
        f"{h}, {_cms_bucket_sql('user_id', a, b)}" for h, a, b in _CMS_SEEDS
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .selectExpr(f"stack({len(_CMS_SEEDS)}, {cells}) AS (h, bucket)")
        .groupBy("h", "bucket")
        .count()
    )
    want = {(r["h"], r["bucket"]): r["count"] for r in batch.collect()}
    assert got == want


def test_streaming_ewma_equals_batch(spark, sf_dir, replay_dir):
    """q36's incremental form: replaying the time-ordered chunks through
    the O(1)-state EWMA must land BIT-EXACTLY on the batch ordered
    fold — the multiply-add sequence is identical, so no tolerance."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_etl import q9336_ewma

    name = f"ewma_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.streaming_ewma(stream), name, "update")
    # update mode emits one row per (user, trigger); the final state is
    # the row with the highest n_events per user.
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "ewma_u")).alias("m"))
        .select("user_id", F.col("m.n_events").alias("n_events"),
                F.col("m.ewma_u").alias("ewma_u"))
    )
    got = {r["user_id"]: (r["n_events"], r["ewma_u"]) for r in final.collect()}
    want = {
        r["user_id"]: (r["n_events"], r["ewma_u"])
        for r in q9336_ewma(spark, sf_dir).collect()
    }
    assert got == want  # exact float equality, by construction


def test_streaming_cdc_apply_equals_batch(spark, sf_dir, replay_dir):
    """q31's incremental form: per-key keep-last upsert/tombstone state
    replayed over the chunks must equal the batch CDC apply (surviving
    keys, applied ts, value, and op count all exact)."""
    from eprints_to_hyku_data_tool_spark.plans.q_r5_etl import z138331_cdc_apply

    name = f"cdc_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    _run_to_memory(ops.streaming_cdc_apply(stream), name, "update")
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "n_ops", "applied_ts_us", "final_value_u", "is_deleted"
                )
            ).alias("m")
        )
        .select(
            "user_id",
            F.col("m.applied_ts_us").alias("applied_ts_us"),
            F.col("m.final_value_u").alias("final_value_u"),
            F.col("m.n_ops").alias("n_ops"),
            F.col("m.is_deleted").alias("is_deleted"),
        )
        .filter(~F.col("is_deleted"))
        .drop("is_deleted")
    )
    got = {r["user_id"]: (r["applied_ts_us"], r["final_value_u"], r["n_ops"])
           for r in final.collect()}
    want = {r["user_id"]: (r["applied_ts_us"], r["final_value_u"], r["n_ops"])
            for r in z138331_cdc_apply(spark, sf_dir).collect()}
    assert got == want


def test_streaming_quantization_is_floor_for_negative_values(spark):
    """ADVICE r5: the stateful EWMA/CDC updaters quantized with
    int(v*1e6+0.5) — truncation toward zero — while the batch q36/q31
    use floor(); the fixtures' non-negative values masked the
    divergence. Replay crafted NEGATIVE values and pin both updaters to
    the batch floor(v*1e6+0.5) idiom (for v = -1.3, floor gives
    -1300000 while int() gave -1299999)."""
    import math

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="neg_replay_")
    try:
        vals = [-1.3, -0.0000005, -2.7182818, 3.5, -1.9999999]
        pdf = pd.DataFrame(
            {
                "event_id": range(1, len(vals) + 1),
                "ts": pd.to_datetime(
                    [f"2024-01-01 00:00:0{i}" for i in range(len(vals))]
                ),
                "user_id": [7] * len(vals),
                "event_type": ["purchase"] * len(vals),
                "value": vals,
                "props": ["{}"] * len(vals),
            }
        )
        spark.createDataFrame(pdf, schema=ops.EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{tmp}/chunk=0")

        name = f"negewma_{uuid.uuid4().hex[:8]}"
        stream = ops.events_stream(spark, _chunks_glob(tmp))
        _run_to_memory(ops.streaming_ewma(stream), name, "update")
        row = (
            spark.table(name)
            .orderBy(F.desc("n_events"))
            .limit(1)
            .collect()[0]
        )
        ewma, n = 0.0, 0
        for v in vals:
            x = float(math.floor(v * 1e6 + 0.5))
            ewma = x if n == 0 else ewma * 0.75 + x * 0.25
            n += 1
        assert row["n_events"] == n
        assert row["ewma_u"] == ewma  # exact: identical multiply-add chain

        name = f"negcdc_{uuid.uuid4().hex[:8]}"
        stream = ops.events_stream(spark, _chunks_glob(tmp))
        _run_to_memory(ops.streaming_cdc_apply(stream), name, "update")
        row = (
            spark.table(name).orderBy(F.desc("n_ops")).limit(1).collect()[0]
        )
        # last event by (ts, event_id) carries value -1.9999999
        assert row["final_value_u"] == math.floor(-1.9999999 * 1e6 + 0.5)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# Streaming MERGE into a ledger table (streaming/ledger_sink.py)
# --------------------------------------------------------------------------
def test_stream_merge_upserts_every_chunk(spark, sf_dir, replay_dir, tmp_path):
    """End-to-end streaming upsert: a ledger table pre-seeded with
    stale rows (value = -1) for the first chunk's keys receives the
    full replay through merge_stream; the final snapshot must hold
    every event exactly once with no stale value left, and each
    micro-batch must have committed one transactional version."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.streaming import ledger_sink

    ev = spark.read.schema(ops.EVENTS_STREAM_SCHEMA).parquet(
        _chunks_glob(replay_dir)
    )
    t = str(tmp_path / "t")
    seed = ev.orderBy("ts", "event_id").limit(100).withColumn(
        "value", F.lit(-1.0)
    )
    ledger.create(spark, t, seed, key="event_id")

    stream = ops.events_stream(spark, _chunks_glob(replay_dir))
    q = (
        ledger_sink.merge_stream(
            stream, t, str(tmp_path / "ckpt"), txn_app="replay-test"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    final = ledger.read(spark, t)
    assert final.count() == ev.count()
    assert final.filter("value = -1.0").count() == 0
    # One committed version per micro-batch, each carrying its txn.
    txns = [
        m["txn"] for m in ledger.history(t) if m.get("txn") is not None
    ]
    assert [x["app"] for x in txns] == ["replay-test"] * len(txns)
    assert [x["batch"] for x in txns] == sorted(x["batch"] for x in txns)
    assert ledger.latest_txn(t, "replay-test") == max(
        x["batch"] for x in txns
    )


def test_merge_batch_skips_redelivered_batch(spark, sf_dir, tmp_path):
    """The exactly-once core: after checkpoint recovery foreachBatch
    re-delivers the last batch with the same id — the sink must skip
    it (no new version), then accept the NEXT id."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.streaming import ledger_sink

    nation = load_table(spark, sf_dir, "nation")
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, nation.filter("n_nationkey < 10"), key="n_nationkey"
    )
    batch = nation.filter("n_nationkey >= 10")

    v1 = ledger_sink.merge_batch(t, batch, 0, "app")
    assert v1 == 1
    assert ledger_sink.merge_batch(t, batch, 0, "app") is None  # re-delivery
    assert ledger.latest_version(t) == 1
    v2 = ledger_sink.merge_batch(t, batch, 1, "app")
    assert v2 == 2
    # A different transactional identity is not fooled by app's ids.
    assert ledger.latest_txn(t, "other-app") is None


# --------------------------------------------------------------------------
# Ledger tables as a streaming SOURCE (sources/ledger_stream.py)
# --------------------------------------------------------------------------
def _start_feed(spark, table, name, **opts):
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    reader = spark.readStream.format("ledger")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load(table)
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )


def test_ledger_stream_replays_and_tails(spark, sf_dir, tmp_path):
    """format('ledger') streaming source: startingVersion=0 replays
    every committed group, later appends arrive incrementally, and
    pre-evolution rows null-fill added columns — all through the
    Python DataSource API (offsets = manifest versions, partitions =
    file groups, Arrow batches end to end)."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    # Add-column evolution BEFORE the stream starts: the stream schema
    # is the wide one; v0 rows must null-fill.
    ledger.append(
        spark,
        t,
        orders.filter("o_orderkey >= 2000 AND o_orderkey < 3000")
        .withColumn("src", F.lit("w")),
        merge_schema=True,
    )
    n_seed = ledger.read(spark, t).count()
    n_v0 = ledger.read(spark, t, version=0).count()

    q = _start_feed(spark, t, "ledger_feed", startingVersion="0")
    try:
        q.processAllAvailable()
        feed = spark.table("ledger_feed")
        assert feed.count() == n_seed
        assert feed.filter("src IS NULL").count() == n_v0
        # Incremental tail: one more append arrives alone.
        ledger.append(
            spark,
            t,
            orders.filter("o_orderkey >= 3000 AND o_orderkey < 3500")
            .withColumn("src", F.lit("x")),
        )
        q.processAllAvailable()
        got = spark.table("ledger_feed")
        want = ledger.read(spark, t)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        q.stop()


def test_ledger_stream_batch_read_parity(spark, sf_dir, tmp_path):
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    nation = load_table(spark, sf_dir, "nation")
    t = str(tmp_path / "t")
    ledger.create(spark, t, nation, key="n_nationkey")
    register_ledger_source(spark)
    got = spark.read.format("ledger").load(t)
    want = ledger.read(spark, t)
    assert got.schema == want.schema
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ledger_stream_rejects_rewrites_unless_ignore_changes(
    spark, sf_dir, tmp_path
):
    """A merge that rewrites an existing group is not representable as
    an append stream: the query must fail with the declared error; with
    ignoreChanges=true the rewritten group is re-emitted instead (the
    Delta ignoreChanges contract — downstream dedupes)."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    q = _start_feed(spark, t, "ledger_strict", startingVersion="0")
    try:
        q.processAllAvailable()
        delta = orders.filter("o_orderkey < 100").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        )
        ledger.merge(spark, t, delta)
        with pytest.raises(Exception, match="rewrites existing data"):
            q.processAllAvailable()
    finally:
        q.stop()

    # Same table, ignoreChanges=true: the rewritten group re-emits.
    q2 = _start_feed(
        spark, t, "ledger_loose", startingVersion="0", ignoreChanges="true"
    )
    try:
        q2.processAllAvailable()
        feed = spark.table("ledger_loose")
        snap = ledger.read(spark, t)
        # Every current row is present (possibly alongside re-emitted
        # stale versions of rewritten rows); dedupe-by-latest is the
        # documented downstream contract, so assert coverage not count.
        assert feed.count() >= snap.count()
        assert snap.join(
            feed.select("o_orderkey").distinct(),
            "o_orderkey",
            "left_anti",
        ).count() == 0
    finally:
        q2.stop()


def test_ledger_to_ledger_cdc_pipeline(spark, sf_dir, tmp_path):
    """Capstone: an exactly-once ledger->ledger CDC pipeline. Source
    table receives append commits; a ledger stream tails it, a
    transformation runs per micro-batch, and ledger_sink upserts the
    result transactionally into a second ledger table. The downstream
    snapshot must equal the batch-computed transform of the upstream
    snapshot, and every micro-batch must have committed exactly one
    txn-stamped version."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.streaming import ledger_sink

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def transform(df):
        # Per-row enrichment (keeps keys unique per batch, the sink's
        # source contract).
        return df.withColumn(
            "price_band",
            F.when(F.col("o_totalprice") < 100000, "low").otherwise("high"),
        )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ledger.create(
        spark, src, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    ledger.create(
        spark,
        dst,
        transform(orders.filter("o_orderkey < 0")),  # empty, wide schema
        key="o_orderkey",
    )

    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    feed = transform(
        spark.readStream.format("ledger")
        .option("startingVersion", "0")
        .load(src)
    )
    q = ledger_sink.merge_stream(
        feed, dst, str(tmp_path / "ckpt"), txn_app="cdc-e2e"
    ).start()
    try:
        q.processAllAvailable()
        ledger.append(spark, src, orders.filter("o_orderkey >= 2000"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = ledger.read(spark, dst)
    want = transform(ledger.read(spark, src))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    txns = [m["txn"] for m in ledger.history(dst) if m.get("txn")]
    assert txns and all(x["app"] == "cdc-e2e" for x in txns)
    assert ledger.latest_txn(dst, "cdc-e2e") == max(x["batch"] for x in txns)


def test_ledger_stream_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Offsets live in Spark's checkpoint: a stopped-and-restarted
    query (same checkpoint, parquet sink) must deliver every row
    exactly once across the restart — commits made while the stream
    was down arrive after restart, nothing re-emits."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )

    def start():
        return (
            spark.readStream.format("ledger")
            .option("startingVersion", "0")
            .load(t)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # Committed while the stream is DOWN.
    ledger.append(
        spark, t, orders.filter("o_orderkey >= 2000 AND o_orderkey < 3000")
    )
    q = start()
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    want = ledger.read(spark, t)
    assert got.count() == want.count()  # exactly once, no re-emission
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ledger_stream_max_versions_per_batch(spark, sf_dir, tmp_path):
    """Backpressure: a 4-commit replay with maxVersionsPerBatch=1 must
    arrive as (at least) four micro-batches, one commit each, and still
    deliver every row exactly once."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    for i in range(3):
        lo, hi = 1000 + i * 500, 1500 + i * 500
        ledger.append(
            spark,
            t,
            orders.filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}"),
        )

    q = _start_feed(
        spark,
        t,
        "ledger_paced",
        startingVersion="0",
        maxVersionsPerBatch="1",
    )
    try:
        q.processAllAvailable()
        got = spark.table("ledger_paced")
        want = ledger.read(spark, t)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        # One commit per non-empty micro-batch: four data-bearing
        # batches (create + 3 appends).
        data_batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(data_batches) >= 4
        assert max(p["numInputRows"] for p in data_batches) <= 1000
    finally:
        q.stop()


def test_ledger_stream_cap_survives_restart(spark, sf_dir, tmp_path):
    """maxVersionsPerBatch + checkpoint restart: the reconstructed
    reader has no engine offset yet, so the cap must be SUSPENDED until
    the engine reveals one — otherwise latestOffset would regress below
    the committed offset and re-deliver every version. Exactly-once
    across the restart is the assertion."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    for i in range(3):
        lo, hi = 1000 + i * 500, 1500 + i * 500
        ledger.append(
            spark,
            t,
            orders.filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}"),
        )

    def start():
        return (
            spark.readStream.format("ledger")
            .option("startingVersion", "0")
            .option("maxVersionsPerBatch", "1")
            .load(t)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    ledger.append(
        spark, t, orders.filter("o_orderkey >= 2500 AND o_orderkey < 3000")
    )
    ledger.append(spark, t, orders.filter("o_orderkey >= 3000"))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    want = ledger.read(spark, t)
    assert got.count() == want.count()  # no re-delivery, nothing lost
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_neardup_ignores_shingleless_docs(spark, sf_dir, tmp_path):
    """Docs with fewer than SHINGLE_K tokens have EMPTY shingle sets:
    all minhashes are NULL and every such doc would share a band hash
    (xxhash64 skips NULL children), emitting degenerate (0,0) pairs the
    batch path never produces. They must be dropped before banding."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hi there",             # 2 tokens: shingle-less
                "ok",                   # 1 token: shingle-less
                "a b c d e f g h i j",  # real doc
                "a b c d e f g h i k",  # near-dup of doc 3
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [8, 2, 19, 19],
        }
    )
    src = str(tmp_path / "chunks")
    spark.createDataFrame(rows, schema=ops.DOCS_STREAM_SCHEMA).coalesce(
        1
    ).write.parquet(f"{src}/chunk=0")
    name = f"ndz_{uuid.uuid4().hex[:8]}"
    stream = ops.docs_stream(spark, f"{src}/chunk=*")
    _run_to_memory(ops.streaming_neardup(stream), name, "append")
    got = spark.table(name).collect()
    # No pair may involve the shingle-less docs or a zero-size union.
    assert all(r["union_size"] > 0 for r in got)
    assert all(r["id_a"] not in (1, 2) and r["id_b"] not in (1, 2) for r in got)


def test_streaming_neardup_redelivered_doc_is_keep_first(spark, tmp_path):
    """code-review r15: a re-delivered doc_id (duplicate/corrected
    upstream record) must not re-emit its pair set into the APPEND sink
    or store a second state copy (whose append would evict a DISTINCT
    older member at the cap). Keep-first, matching the batch path where
    each doc contributes exactly one row. Two triggers: the duplicate
    arrives again in a later micro-batch, against persisted state."""
    import time as _time

    import pandas as pd

    batch1 = pd.DataFrame(
        {
            "doc_id": [3, 4],
            # Identical text: Jaccard 1.0, so the (3, 4) pair collides
            # in EVERY band — the emitted row count is deterministic
            # and any re-emission shows up as extra rows.
            "text": ["a b c d e f g h i j"] * 2,
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [19, 19],
        }
    )
    batch2 = batch1.iloc[[0]]  # doc 3 re-delivered verbatim

    def replay(chunks, tag):
        src = str(tmp_path / f"chunks_{tag}")
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(
                chunk, schema=ops.DOCS_STREAM_SCHEMA
            ).coalesce(1).write.parquet(f"{src}/chunk={i}")
            _time.sleep(1.1)  # distinct mtimes -> deterministic order
        name = f"nddup_{tag}_{uuid.uuid4().hex[:8]}"
        ck = str(tmp_path / f"ck_{tag}")
        stream = ops.docs_stream(
            spark, f"{src}/chunk=*", max_files_per_trigger=1
        )
        q = (
            ops.streaming_neardup(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = sorted(
            (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
            for r in spark.table(name).collect()
        )
        return rows, ck

    base_rows, _ = replay((batch1,), "base")
    dup_rows, dup_ck = replay((batch1, batch2), "dup")

    # A pair colliding in k bands is emitted once per band (documented
    # set semantics), so compare MULTISETS against the no-redelivery
    # baseline: the duplicate trigger must add ZERO rows.
    assert len(base_rows) > 0 and {r[:2] for r in base_rows} == {(3, 4)}
    assert dup_rows == base_rows, (len(dup_rows), len(base_rows))
    # And no bucket stores doc 3 twice.
    dup_members = (
        spark.read.format("statestore")
        .load(dup_ck)
        .select(F.col("value.groupState.ids").alias("ids"))
        .filter(F.size("ids") != F.size(F.array_distinct("ids")))
        .count()
    )
    assert dup_members == 0


def test_merge_batch_zombie_race_is_idempotent(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Check-then-act hole (review finding): a zombie driver commits
    the SAME batch between the sink's latest_txn read and its commit.
    The raced commit must loop back through the idempotence check and
    return None — never double-apply the batch."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.streaming import ledger_sink

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    batch = orders.filter(
        "o_orderkey >= 2000 AND o_orderkey < 2500"
    )

    real_commit = ledger._commit
    state = {"raced": False}

    def zombie(table_, manifest):
        if not state["raced"]:
            state["raced"] = True
            parent = ledger._read_manifest(
                table_, ledger.latest_version(table_)
            )
            real_commit(
                table_,
                ledger._new_manifest(
                    parent,
                    "merge",
                    parent["groups"],
                    txn={"app": "zombie-test", "batch": 7},
                ),
            )
        return real_commit(table_, manifest)

    monkeypatch.setattr(ledger, "_commit", zombie)
    out = ledger_sink.merge_batch(t, batch, 7, "zombie-test")
    assert out is None  # the zombie's commit was detected, not repeated
    txns = [m["txn"] for m in ledger.history(t) if m.get("txn")]
    assert len([x for x in txns if x["batch"] == 7]) == 1


def test_ledger_stream_resumes_past_expired_committed_offset(
    spark, sf_dir, tmp_path
):
    """A restarted stream whose COMMITTED offset version has since been
    expired must still resume: delta-native planning never resolves the
    offset version itself — it only reads the raw deltas AFTER it
    (code-review r13 finding; the resolved-set planner died here)."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    def one(k):
        return spark.createDataFrame([(k, k * 10)], "k long, v long")

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    ledger.create(spark, t, one(0), key="k")
    ledger.append(spark, t, one(1))  # v1
    ledger.append(spark, t, one(2))  # v2

    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    got: list = []

    def sink(df, _bid, got=got):
        got.extend(r["k"] for r in df.collect())

    q = (
        spark.readStream.format("ledger").load(t)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()  # reader initialized at offset v2
        ledger.append(spark, t, one(3))  # v3 — the offset we commit at
        q.processAllAvailable()
        assert got == [3]
    finally:
        q.stop()

    for k in range(4, 10):  # v4..v9
        ledger.append(spark, t, one(k))
    # Deletes v0..v3 INCLUDING the committed offset; v4..v9 survive.
    expired = ledger.expire_history(t, keep_last=6)
    assert 3 in expired
    ledger._RESOLVE_CACHE.clear()

    got2: list = []

    def sink2(df, _bid, got2=got2):
        got2.extend(r["k"] for r in df.collect())

    q = (
        spark.readStream.format("ledger").load(t)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        assert sorted(got2) == list(range(4, 10))
    finally:
        q.stop()


def test_ledger_stream_skips_compact_and_optimize(spark, sf_dir, tmp_path):
    """compact()/optimize_zorder are row-identical relayouts marked
    data_change=false — a downstream stream skips them instead of
    failing (or re-emitting the whole table under ignoreChanges): the
    Delta dataChange contract, and the property that makes compaction
    usable on streamed ingest tables at all."""
    from eprints_to_hyku_data_tool_spark.sources import ledger

    def one(k):
        return spark.createDataFrame([(k, k * 10)], "k long, v long")

    t = str(tmp_path / "t")
    ledger.create(spark, t, one(0), key="k")
    for k in range(1, 4):
        ledger.append(spark, t, one(k))

    q = _start_feed(spark, t, "maint_feed", startingVersion="0")
    try:
        q.processAllAvailable()
        assert spark.table("maint_feed").count() == 4
        ledger.compact(spark, t, max_rows=100)  # packs the tiny groups
        ledger.optimize_zorder(spark, t, ["k"], target_rows=100)
        q.processAllAvailable()  # both skipped: no error, NO duplicates
        assert spark.table("maint_feed").count() == 4
        ledger.append(spark, t, one(99))  # post-maintenance tail
        q.processAllAvailable()
        got = sorted(r["k"] for r in spark.table("maint_feed").collect())
        assert got == [0, 1, 2, 3, 99]
    finally:
        q.stop()


def test_ledger_stream_fails_loudly_on_schema_change_then_resumes(
    spark, sf_dir, tmp_path
):
    """An add-column evolution committed WHILE a stream runs fails the
    query (silently continuing would drop the new column's values from
    the feed forever — the Delta contract); a restart picks up the new
    schema and the same version replays cleanly from the checkpoint."""
    import pyspark.sql.utils as U
    from pyspark.sql import functions as F

    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    def one(k):
        return spark.createDataFrame([(k, k * 10)], "k long, v long")

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    ledger.create(spark, t, one(0), key="k")
    register_ledger_source(spark)
    rows1: list = []

    def sink1(df, _bid, rows1=rows1):
        rows1.extend(df.collect())

    q = (
        spark.readStream.format("ledger").load(t)
        .writeStream.foreachBatch(sink1)
        .option("checkpointLocation", ckpt).start()
    )
    failed = False
    try:
        q.processAllAvailable()
        ledger.append(
            spark,
            t,
            one(1).withColumn("flag", F.lit(7).cast("long")),
            merge_schema=True,
        )
        try:
            q.processAllAvailable()
            q.awaitTermination(5)
        except Exception as ex:
            failed = True
            assert "changed the table schema" in str(ex)
    finally:
        try:
            q.stop()
        except Exception:
            pass
    assert failed, "schema change must fail the running stream"

    # Restart: schema() now returns the wide schema; the evolution
    # version replays from the checkpoint with the new column intact.
    rows2: list = []

    def sink2(df, _bid, rows2=rows2):
        rows2.extend(df.collect())

    q = (
        spark.readStream.format("ledger").load(t)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        assert {r["k"]: r["flag"] for r in rows2} == {1: 7}
    finally:
        q.stop()


def test_resolve_cache_pickles_empty():
    """ledger is registered for by-value cloudpickling; a hot resolve
    cache must not ride into every pickled reader (code-review r13)."""
    import pickle

    from eprints_to_hyku_data_tool_spark.sources import ledger

    ledger._RESOLVE_CACHE[("x", 1, 0, 0)] = {"groups": [{"path": "p"}]}
    try:
        clone = pickle.loads(pickle.dumps(ledger._RESOLVE_CACHE))
        assert clone == {} and isinstance(clone, type(ledger._RESOLVE_CACHE))
    finally:
        ledger._RESOLVE_CACHE.clear()


def test_ledger_stream_model_based_random_ops(spark, sf_dir, tmp_path):
    """Model-based check of the delta-native streaming source: a seeded
    random sequence of append / compact / optimize / expire_history /
    cache-clears against a LIVE stream (plus one mid-sequence restart
    from the checkpoint). Invariant: the feed equals the multiset of
    appended rows — maintenance commits contribute nothing (dataChange
    contract), expiry never stalls the stream (offsets stay ahead of
    the kept window), and the restart re-delivers nothing."""
    import random

    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.sources.ledger_stream import (
        register_ledger_source,
    )

    rng = random.Random(1313)
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v long")

    ledger.create(spark, t, df_of([(0, 0)]), key="k")
    register_ledger_source(spark)
    got: list = []

    def sink(df, _bid, got=got):
        got.extend((r["k"], r["v"]) for r in df.collect())

    def start():
        return (
            spark.readStream.format("ledger")
            .option("startingVersion", 0).load(t)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt).start()
        )

    q = start()
    expected = [(0, 0)]
    next_k = 1
    restarted = False
    try:
        q.processAllAvailable()
        for step in range(18):
            op = rng.choice(
                ["append", "append", "compact", "optimize",
                 "expire", "clear_cache", "restart"]
            )
            if op == "append":
                rows = [(next_k + i, rng.randrange(1000)) for i in range(2)]
                next_k += 10
                ledger.append(spark, t, df_of(rows))
                expected.extend(rows)
            elif op == "compact":
                ledger.compact(spark, t, max_rows=1000)
            elif op == "optimize":
                ledger.optimize_zorder(spark, t, ["k"], target_rows=1000)
            elif op == "expire":
                if len(ledger._versions(t)) > 4:
                    ledger.expire_history(t, keep_last=3)
            elif op == "clear_cache":
                ledger._RESOLVE_CACHE.clear()
            elif op == "restart" and not restarted:
                restarted = True
                q.processAllAvailable()
                q.stop()
                q = start()
            q.processAllAvailable()
            assert sorted(got) == sorted(expected), f"step {step} op {op}"
    finally:
        q.stop()
    assert restarted or True  # restart is opportunistic under the seed


def test_ledger_stream_legacy_window_honors_stream_contracts(
    spark, tmp_path
):
    """r13-advice regression: one legacy full-snapshot manifest in a
    micro-batch window routes the WHOLE window through resolved-set
    planning — which must apply the same contracts as the delta path:
    a data_change=false relayout (compact) in that window is skipped,
    not raised as a rewrite; and a schema widening in that window fails
    loudly instead of silently dropping the new column's values."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from .test_ledger import _legacyize

    def one(k):
        return spark.createDataFrame([(k, k * 10)], "k long, v long")

    # Arm 1: compact after a legacy manifest, same window -> skipped.
    t = str(tmp_path / "t")
    ledger.create(spark, t, one(0), key="k")
    ledger.append(spark, t, one(1))
    _legacyize(t, 1)
    ledger.compact(spark, t, max_rows=100)  # v2, data_change=false
    ledger.append(spark, t, one(2))  # v3
    # v4: a pure-insert merge (disjoint keys, removes nothing). The
    # compacted-away paths must not linger in the emitted set — they
    # would make this non-append op falsely read as a rewrite, which
    # the delta path explicitly streams cleanly.
    ledger.merge(spark, t, one(3))
    q = _start_feed(spark, t, "legacy_feed", startingVersion="0")
    try:
        q.processAllAvailable()  # window [0..4] contains the legacy v1
        got = sorted(r["k"] for r in spark.table("legacy_feed").collect())
        assert got == [0, 1, 2, 3]  # compact emitted nothing, no error
    finally:
        q.stop()

    # Arm 2: a schema widening lands MID-STREAM in the same window as a
    # legacy manifest -> the resolved path must fail with the declared
    # restart error (the delta path never reaches the widening version:
    # planning falls back at the legacy one before it).
    t2 = str(tmp_path / "t2")
    ledger.create(spark, t2, one(0), key="k")
    q2 = _start_feed(spark, t2, "legacy_feed2", startingVersion="0")
    try:
        q2.processAllAvailable()  # reader schema pinned at (k, v)
        ledger.append(spark, t2, one(1))  # v1
        _legacyize(t2, 1)
        wide = spark.createDataFrame(
            [(2, 20, "x")], "k long, v long, w string"
        )
        ledger.append(spark, t2, wide, merge_schema=True)  # v2 widens
        with pytest.raises(Exception, match="changed the table schema"):
            q2.processAllAvailable()
    finally:
        q2.stop()


def test_merge_batch_zombie_cannot_overwrite_newer_state(
    spark, tmp_path, monkeypatch
):
    """code-review r14: emulate the zombie interleaving at the sink —
    the pre-flight latest_txn read is forced to say 'not applied' (the
    stalled driver's stale view) while the table has since recorded the
    batch; merge_batch must skip (None) via the in-commit guard instead
    of overwriting newer state."""
    from eprints_to_hyku_data_tool_spark.sources import ledger
    from eprints_to_hyku_data_tool_spark.streaming import ledger_sink

    def one(k, v):
        return spark.createDataFrame([(k, v)], "k long, v long")

    t = str(tmp_path / "t")
    ledger.create(spark, t, one(0, 0), key="k")
    assert ledger_sink.merge_batch(t, one(1, 10), 10, "app") is not None
    assert ledger_sink.merge_batch(t, one(1, 12), 12, "app") is not None

    monkeypatch.setattr(ledger, "latest_txn", lambda *a, **kw: None)
    assert ledger_sink.merge_batch(t, one(1, 999), 10, "app") is None
    monkeypatch.undo()
    got = {r["k"]: r["v"] for r in ledger.read(spark, t).collect()}
    assert got == {0: 0, 1: 12}  # batch 12's value survived the zombie


def test_streaming_ewma_rejects_out_of_order_delivery(spark, tmp_path):
    """code-review r14: EWMA is an order-sensitive fold — an event
    arriving one trigger later than an event-time-newer event must FAIL
    loudly (the state's event-time cursor), not silently corrupt the
    state forever. The sort only fixes ordering WITHIN a batch."""
    import time as _time

    import pandas as pd

    d = str(tmp_path / "ooo")
    base = pd.Timestamp("2024-01-01 10:00:00")
    rows1 = pd.DataFrame(
        {"event_id": [1, 2], "ts": [base, base + pd.Timedelta(hours=1)],
         "user_id": [7, 7], "event_type": ["click", "click"],
         "value": [1.0, 2.0], "props": ["{}", "{}"]}
    )
    rows2 = pd.DataFrame(  # event-time EARLIER than batch 1's max
        {"event_id": [3], "ts": [base + pd.Timedelta(minutes=30)],
         "user_id": [7], "event_type": ["click"],
         "value": [3.0], "props": ["{}"]}
    )
    for i, chunk in enumerate((rows1, rows2)):
        spark.createDataFrame(chunk, schema=ops.EVENTS_STREAM_SCHEMA).coalesce(
            1
        ).write.parquet(f"{d}/c={i}")
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    name = f"ooo_{uuid.uuid4().hex[:8]}"
    stream = ops.events_stream(spark, f"{d}/*", max_files_per_trigger=1)
    with pytest.raises(Exception, match="out-of-order delivery"):
        _run_to_memory(ops.streaming_ewma(stream), name, "update")


def test_streaming_neardup_evicts_oldest_at_cap(
    spark, sf_dir, docs_replay_dir, monkeypatch, tmp_path
):
    """advice r15 / verdict r14 stretch: at the per-bucket ceiling the
    operator must EVICT oldest members (FIFO dedupe horizon) rather than
    fail the stream, the stored state must stay bounded even when a
    single hot micro-batch delivers many members (the cap is enforced
    inside the append loop, not just at state load), and the degradation
    must be monitorable — the cumulative per-bucket eviction count rides
    in state where spark.read.format('statestore') reads it. Pairs that
    survive the horizon are still exact-verified, so the emitted set is
    a subset of the batch result, never a fabrication."""
    monkeypatch.setattr(ops, "NEARDUP_MAX_BUCKET_MEMBERS", 1)
    name = f"cap_{uuid.uuid4().hex[:8]}"
    ck = str(tmp_path / "ck")
    stream = ops.docs_stream(spark, _chunks_glob(docs_replay_dir))
    q = (
        ops.streaming_neardup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    state = (
        spark.read.format("statestore")
        .load(ck)
        .select(
            F.size("value.groupState.ids").alias("n_members"),
            F.col("value.groupState.n_evicted").alias("n_evicted"),
        )
    )
    agg = state.agg(
        F.max("n_members").alias("max_members"),
        F.sum("n_evicted").alias("total_evicted"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    assert agg["n_buckets"] > 0
    # The ceiling bounds the STORED state (not just the state seen at
    # batch entry): whole replay arrives in a handful of triggers, so
    # without the in-loop check buckets would hold far more than 1.
    assert agg["max_members"] <= 1, agg
    # The fixture has multi-member buckets, so eviction must have fired
    # and been counted — silent degradation is the failure mode here.
    assert agg["total_evicted"] > 0, agg

    got = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in REGISTRY["z12786_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert len(want) > 0 and got <= want


def test_restore_neardup_bucket_dedupes_legacy_state():
    """code-review r15 (second pass): a checkpoint written by the
    pre-keep-first code can hold a doc_id twice; a membership set built
    as set(ids) would desync from the deque when the cap pops one copy,
    letting a redelivery match the surviving copy and emit a SELF-pair.
    Restore must be keep-first, then apply the cap to the deduped
    bucket."""
    ids, shs, member, n_ev = ops._restore_neardup_bucket(
        [7, 7, 8, 9], [["a"], ["a"], ["b"], ["c"]], 2, cap=2
    )
    assert list(ids) == [8, 9] and member == {8, 9}
    assert list(shs) == [frozenset({"b"}), frozenset({"c"})]
    # dedupe is NOT an eviction (the doc is still represented); only the
    # cap pop counts: [7, 8, 9] -> evict 7 -> prior 2 + 1.
    assert n_ev == 3
