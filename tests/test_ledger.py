"""Ledger tables (sources/ledger.py): the transactional parquet table
format — snapshot isolation, time travel, copy-on-write MERGE/DELETE
with file-group pruning, optimistic concurrency, vacuum.

The MERGE correctness oracle is DuckDB executing the same upsert as
pure SQL over the same inputs (the z8330 relational semantics); the
SCALE property under test is copy-on-write — untouched file groups must
carry over by reference (same path strings in the child manifest), with
their bytes never rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.sources import ledger
from eprints_to_hyku_data_tool_spark.sources.tables import load_table

from .parity import assert_parity


@pytest.fixture()
def orders_slices(spark, sf_dir):
    """A deterministic snapshot/delta pair from the orders fixture:
    snapshot = o_orderkey < 4000; delta = updates for keys in
    [2000, 4000) (totalprice bumped) + inserts for [4000, 5000)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    snap = orders.filter(F.col("o_orderkey") < 4000)
    delta = (
        orders.filter(
            (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 5000)
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") < 4000, F.col("o_totalprice") + 1000.0
            ).otherwise(F.col("o_totalprice")),
        )
    )
    return snap, delta


def test_create_read_roundtrip(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    nation = load_table(spark, sf_dir, "nation")
    v = ledger.create(spark, t, nation, key="n_nationkey")
    assert v == 0
    got = ledger.read(spark, t)
    assert got.schema == nation.schema
    assert got.exceptAll(nation).count() == 0
    assert nation.exceptAll(got).count() == 0


def test_create_twice_fails(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    nation = load_table(spark, sf_dir, "nation")
    ledger.create(spark, t, nation, key="n_nationkey")
    with pytest.raises(ledger.LedgerError, match="already exists"):
        ledger.create(spark, t, nation, key="n_nationkey")


def test_append_and_time_travel(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region.filter("r_regionkey < 3"))
    v1 = ledger.append(spark, t, region.filter("r_regionkey >= 3"))
    assert v1 == 1
    assert ledger.read(spark, t).count() == region.count()
    # Time travel: version 0 is still exactly the original slice.
    assert ledger.read(spark, t, version=0).count() == 3
    ops = [m["op"] for m in ledger.history(t)]
    assert ops == ["create", "append"]


def test_append_schema_enforced(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region)
    with pytest.raises(ledger.LedgerError, match="schema mismatch"):
        ledger.append(spark, t, region.select("r_regionkey"))


def test_merge_matches_duckdb_upsert(
    spark, sf_dir, duck, tmp_path, orders_slices
):
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    ledger.merge(spark, t, delta)
    oracle = """
    WITH snap AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                  FROM orders WHERE o_orderkey < 4000),
         delta AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                          CASE WHEN o_orderkey < 4000
                               THEN o_totalprice + 1000.0
                               ELSE o_totalprice END AS o_totalprice
                   FROM orders
                   WHERE o_orderkey >= 2000 AND o_orderkey < 5000)
    SELECT * FROM delta
    UNION ALL
    SELECT s.* FROM snap s ANTI JOIN delta d USING (o_orderkey)
    """
    assert_parity(ledger.read(spark, t), oracle, duck, "ledger_merge")


def test_merge_is_copy_on_write(spark, sf_dir, tmp_path, orders_slices):
    """The 100 TB property: groups outside the delta's key range carry
    over BY REFERENCE — same path in the child manifest, bytes never
    rewritten — and only overlapping groups are replaced."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    # Three groups with disjoint key ranges via three appends.
    ledger.create(
        spark, t, snap.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    ledger.append(
        spark, t, snap.filter("o_orderkey >= 1000 AND o_orderkey < 2000")
    )
    ledger.append(spark, t, snap.filter("o_orderkey >= 2000"))
    before = ledger.history(t)[-1]["groups"]
    assert len(before) == 3

    ledger.merge(spark, t, delta)  # delta keys all >= 2000
    after = ledger.history(t)[-1]["groups"]
    after_paths = {g["path"] for g in after}
    # The two low-range groups survive verbatim; the third is replaced.
    assert before[0]["path"] in after_paths
    assert before[1]["path"] in after_paths
    assert before[2]["path"] not in after_paths
    assert len(after) == 3

    # And the result is still the correct upsert.
    expected = (
        snap.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(delta)
    )
    got = ledger.read(spark, t)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_merge_rejects_duplicate_source_keys(
    spark, sf_dir, tmp_path, orders_slices
):
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    with pytest.raises(ledger.LedgerError, match="duplicate or NULL"):
        ledger.merge(spark, t, delta.unionByName(delta.limit(1)))
    # NULL keys are equally unmergeable (each would be an unmatchable
    # insert) and share the preflight.
    with pytest.raises(ledger.LedgerError, match="duplicate or NULL"):
        ledger.merge(
            spark,
            t,
            delta.limit(3).withColumn(
                "o_orderkey", F.lit(None).cast("long")
            ),
        )


def test_merge_requires_key(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    nation = load_table(spark, sf_dir, "nation")
    ledger.create(spark, t, nation)  # no key
    with pytest.raises(ledger.LedgerError, match="requires a table"):
        ledger.merge(spark, t, nation)


def test_delete_where_copy_on_write(spark, sf_dir, tmp_path, orders_slices):
    snap, _ = orders_slices
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, snap.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    ledger.append(spark, t, snap.filter("o_orderkey >= 2000"))
    before = ledger.history(t)[-1]["groups"]

    ledger.delete_where(spark, t, "o_orderkey >= 3000")
    after = ledger.history(t)[-1]["groups"]
    # Group 1 (keys < 2000) has no matches: carried over verbatim.
    assert before[0]["path"] in {g["path"] for g in after}
    got = ledger.read(spark, t)
    assert got.filter("o_orderkey >= 3000").count() == 0
    assert got.count() == snap.filter("o_orderkey < 3000").count()


def test_concurrent_commit_conflict(spark, sf_dir, tmp_path):
    """Two writers committing against the same parent: the second must
    fail loudly, never silently clobber."""
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region)
    parent = ledger._read_manifest(t, 0)
    m1 = ledger._new_manifest(parent, "append", parent["groups"])
    m2 = ledger._new_manifest(parent, "append", parent["groups"])
    ledger._commit(t, m1)
    with pytest.raises(ledger.ConcurrentCommitError):
        ledger._commit(t, m2)


def test_expire_and_vacuum(spark, sf_dir, tmp_path, orders_slices):
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    ledger.merge(spark, t, delta)  # v1 rewrites the only group
    final = ledger.read(spark, t).count()

    # Both versions' groups are live -> nothing to vacuum yet.
    assert ledger.vacuum(t) == []
    expired = ledger.expire_history(t, keep_last=1)
    assert expired == [0]
    # Fresh groups sit inside the retention window (stream-replay
    # protection); force-collect like an expired-retention vacuum.
    assert ledger.vacuum(t) == []
    removed = ledger.vacuum(t, group_retention_s=0)
    assert len(removed) >= 1  # v0's replaced group is gone
    # Latest snapshot is untouched by the cleanup.
    assert ledger.read(spark, t).count() == final
    with pytest.raises(ledger.LedgerError, match="does not exist"):
        ledger.read(spark, t, version=0)


def test_vacuum_removes_orphan_groups(spark, sf_dir, tmp_path):
    """A crashed writer leaves a data group no manifest references —
    vacuum collects it without touching live groups."""
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region)
    orphan = ledger._write_group(spark, t, region, None)  # never committed
    removed = ledger.vacuum(t, group_retention_s=0)
    assert removed == [orphan["path"]]
    assert ledger.read(spark, t).count() == region.count()


def test_empty_source_merge_is_noop_version(
    spark, sf_dir, tmp_path, orders_slices
):
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    v = ledger.merge(spark, t, delta.filter("o_orderkey < 0"))
    assert v == 1
    assert (
        ledger.history(t)[-1]["groups"] == ledger.history(t)[0]["groups"]
    )


def test_overwrite_new_snapshot(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region)
    ledger.overwrite(spark, t, region.filter("r_regionkey < 2"))
    assert ledger.read(spark, t).count() == 2
    assert ledger.read(spark, t, version=0).count() == region.count()


def test_compact_bin_packs_small_groups(spark, sf_dir, tmp_path):
    """Five tiny appends -> compact packs them into one group (big
    groups carry over by reference), snapshot row-identical, and the
    merged group's key range still covers its members (prunable)."""
    t = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ledger.create(
        spark, t, orders.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    for i in range(4):
        lo, hi = 1000 + i * 500, 1500 + i * 500
        ledger.append(
            spark,
            t,
            orders.filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}"),
        )
    before = ledger.read(spark, t)
    n_before = before.count()
    groups_before = ledger.history(t)[-1]["groups"]
    assert len(groups_before) == 5

    ledger.compact(spark, t, max_rows=1_000_000)
    after_m = ledger.history(t)[-1]
    assert after_m["op"] == "compact"
    assert len(after_m["groups"]) == 1
    g = after_m["groups"][0]
    assert g["rows"] == n_before
    assert g["min_key"] == min(x["min_key"] for x in groups_before)
    assert g["max_key"] == max(x["max_key"] for x in groups_before)
    after = ledger.read(spark, t)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_compact_keeps_big_groups_by_reference(spark, sf_dir, tmp_path):
    t = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    big = orders.filter("o_orderkey < 3000")
    ledger.create(spark, t, big, key="o_orderkey")
    n_big = big.count()
    ledger.append(spark, t, orders.filter("o_orderkey >= 3000 AND o_orderkey < 3100"))
    ledger.append(spark, t, orders.filter("o_orderkey >= 3100 AND o_orderkey < 3200"))
    before = ledger.history(t)[-1]["groups"]

    # Threshold between the big group and the two small ones.
    ledger.compact(spark, t, max_rows=n_big)
    after = ledger.history(t)[-1]["groups"]
    assert before[0]["path"] in {g["path"] for g in after}  # by reference
    assert len(after) == 2  # big + one packed bin


def test_changes_feed_matches_merge_delta(
    spark, sf_dir, tmp_path, orders_slices
):
    """CDF between the pre- and post-merge versions: inserts = the
    merged delta's new state of every touched row that changed, deletes
    = their old state; rows identical across the merge (rewritten but
    unchanged) appear in NEITHER side of the feed."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    ledger.merge(spark, t, delta)

    feed = ledger.changes(spark, t, 0, 1)
    ins = feed.filter("_change_type = 'insert'").drop("_change_type")
    del_ = feed.filter("_change_type = 'delete'").drop("_change_type")

    # Expected inserts: every delta row that differs from the snapshot
    # state (updates changed o_totalprice; inserts are brand-new keys).
    expected_ins = delta.exceptAll(snap)
    assert ins.exceptAll(expected_ins).count() == 0
    assert expected_ins.exceptAll(ins).count() == 0
    # Expected deletes: the old state of updated keys (brand-new keys
    # have no old state).
    expected_del = snap.join(
        delta.select("o_orderkey"), "o_orderkey", "left_semi"
    ).exceptAll(delta)
    assert del_.exceptAll(expected_del).count() == 0
    assert expected_del.exceptAll(del_).count() == 0


def test_changes_skips_carried_groups(spark, sf_dir, tmp_path, orders_slices):
    """Groups carried by reference between versions contribute nothing:
    the feed across a blind append is exactly the appended rows."""
    snap, _ = orders_slices
    t = str(tmp_path / "t")
    lo_df = snap.filter("o_orderkey < 2000")
    hi_df = snap.filter("o_orderkey >= 2000")
    ledger.create(spark, t, lo_df, key="o_orderkey")
    ledger.append(spark, t, hi_df)
    feed = ledger.changes(spark, t, 0, 1)
    assert feed.filter("_change_type = 'delete'").count() == 0
    ins = feed.filter("_change_type = 'insert'").drop("_change_type")
    assert ins.exceptAll(hi_df).count() == 0
    assert hi_df.exceptAll(ins).count() == 0


def test_read_key_between_skips_groups(spark, sf_dir, tmp_path, orders_slices):
    """Manifest-level data skipping: a key-ranged read must (a) return
    exactly what a plain filter of the full snapshot returns and (b)
    plan its scan over ONLY the groups whose ranges overlap."""
    snap, _ = orders_slices
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, snap.filter("o_orderkey < 1500"), key="o_orderkey"
    )
    ledger.append(
        spark, t, snap.filter("o_orderkey >= 1500 AND o_orderkey < 3000")
    )
    ledger.append(spark, t, snap.filter("o_orderkey >= 3000"))

    got = ledger.read(spark, t, key_between=(1500, 2500))
    want = snap.filter("o_orderkey >= 1500 AND o_orderkey <= 2500")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # The scan's input files come from the middle group only.
    files = [r.file for r in got.select(
        F.input_file_name().alias("file")
    ).distinct().collect()]
    groups = ledger.history(t)[-1]["groups"]
    assert all(groups[1]["path"] in f for f in files), files

    with pytest.raises(ledger.LedgerError, match="requires a table"):
        t2 = str(tmp_path / "t2")
        ledger.create(spark, t2, snap)  # keyless
        ledger.read(spark, t2, key_between=(0, 1))


# --------------------------------------------------------------------------
# Multi-column stats (stats_cols) + between pruning
# --------------------------------------------------------------------------
def test_stats_cols_prune_non_key_column(spark, sf_dir, tmp_path):
    """A table keyed on o_orderkey with declared stats on o_totalprice:
    a between-read on the NON-KEY column must (a) equal a plain filter
    of the snapshot and (b) scan only groups whose recorded price range
    overlaps."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    # Three groups CLUSTERED by price (so price ranges are disjoint),
    # while the key ranges interleave — key stats alone cannot prune.
    ledger.create(
        spark,
        t,
        orders.filter("o_totalprice < 50000"),
        key="o_orderkey",
        stats_cols=["o_totalprice"],
    )
    ledger.append(
        spark,
        t,
        orders.filter("o_totalprice >= 50000 AND o_totalprice < 150000"),
    )
    ledger.append(spark, t, orders.filter("o_totalprice >= 150000"))
    groups = ledger.history(t)[-1]["groups"]
    assert len(groups) == 3
    assert all("o_totalprice" in g["stats"] for g in groups)

    got = ledger.read(spark, t, between={"o_totalprice": (60000.0, 90000.0)})
    want = ledger.read(spark, t).filter(
        "o_totalprice >= 60000 AND o_totalprice <= 90000"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # Only the middle group's files are scanned.
    files = [
        r.file
        for r in got.select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    ]
    assert files and all(groups[1]["path"] in f for f in files), files


def test_between_composes_key_and_stats_column(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders, key="o_orderkey", stats_cols=["o_totalprice"]
    )
    got = ledger.read(
        spark,
        t,
        between={"o_orderkey": (100, 3000), "o_totalprice": (0.0, 80000.0)},
    )
    want = orders.filter(
        "o_orderkey BETWEEN 100 AND 3000 "
        "AND o_totalprice BETWEEN 0 AND 80000"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_between_requires_declared_stats(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, orders, key="o_orderkey")
    with pytest.raises(ledger.LedgerError, match="no manifest stats"):
        ledger.read(spark, t, between={"o_totalprice": (0.0, 1.0)})


def test_stats_cols_rejects_unorderable_type(spark, sf_dir, tmp_path):
    """DECIMAL stats would round through the JSON manifest and could
    prune a group that contains matches — rejected at create."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price_dec"),
    )
    t = str(tmp_path / "t")
    with pytest.raises(ledger.LedgerError, match="order-preserving"):
        ledger.create(
            spark, t, lineitem, key="l_orderkey", stats_cols=["price_dec"]
        )


def test_date_stats_survive_manifest_roundtrip(spark, sf_dir, tmp_path):
    """Date stats are stored as ISO strings (lexicographic order ==
    chronological); pruning with datetime.date bounds works and matches
    a plain filter."""
    import datetime

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark,
        t,
        orders.filter("o_orderdate < DATE '1994-01-01'"),
        key="o_orderkey",
        stats_cols=["o_orderdate"],
    )
    ledger.append(
        spark, t, orders.filter("o_orderdate >= DATE '1994-01-01'")
    )
    lo = datetime.date(1995, 1, 1)
    hi = datetime.date(1995, 12, 31)
    got = ledger.read(spark, t, between={"o_orderdate": (lo, hi)})
    want = orders.filter(
        "o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # The pre-1994 group is pruned from the scan plan.
    groups = ledger.history(t)[-1]["groups"]
    files = [
        r.file
        for r in got.select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    ]
    assert files and all(groups[1]["path"] in f for f in files)


# --------------------------------------------------------------------------
# Schema evolution (add-column)
# --------------------------------------------------------------------------
def test_append_merge_schema_adds_nullable_column(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, region.filter("r_regionkey < 3"))
    wide = region.filter("r_regionkey >= 3").withColumn(
        "r_flag", F.lit("new")
    )
    ledger.append(spark, t, wide, merge_schema=True)

    got = ledger.read(spark, t)
    assert got.columns == ["r_regionkey", "r_name", "r_flag"]
    # Old rows read the new column as NULL; new rows carry their value.
    assert got.filter("r_regionkey < 3 AND r_flag IS NULL").count() == 3
    assert got.filter("r_regionkey >= 3 AND r_flag = 'new'").count() == 2
    # Time travel to the pre-evolution version keeps the narrow schema.
    assert ledger.read(spark, t, version=0).columns == [
        "r_regionkey", "r_name",
    ]


def test_merge_with_schema_evolution(spark, sf_dir, tmp_path, orders_slices):
    """Upsert a delta that adds a column: matched rows are replaced by
    the wide source row, unmatched target rows read NULL for the new
    column, untouched groups stay physically narrow (copy-on-write)."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, snap.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    ledger.append(spark, t, snap.filter("o_orderkey >= 1000"))
    before = ledger.history(t)[-1]["groups"]

    wide_delta = delta.withColumn("source_batch", F.lit(7))
    ledger.merge(spark, t, wide_delta, merge_schema=True)

    after = ledger.history(t)[-1]["groups"]
    # The low-key group (keys < 1000, outside the delta's range) carries
    # over by reference even though the table schema widened.
    assert before[0]["path"] in {g["path"] for g in after}

    got = ledger.read(spark, t)
    assert got.columns == [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "source_batch",
    ]
    expected_narrow = (
        snap.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(delta)
    )
    assert got.count() == expected_narrow.count()
    # Every delta key carries batch 7; every surviving row doesn't.
    assert (
        got.filter("source_batch = 7").count() == wide_delta.count()
    )
    assert (
        got.filter("source_batch IS NULL").count()
        == expected_narrow.count() - wide_delta.count()
    )
    # Values round-trip: the narrow projection equals the pure upsert.
    narrow = got.drop("source_batch")
    assert narrow.exceptAll(expected_narrow).count() == 0
    assert expected_narrow.exceptAll(narrow).count() == 0


def test_schema_evolution_rejects_drops_and_type_changes(
    spark, sf_dir, tmp_path
):
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, region)
    with pytest.raises(ledger.LedgerError, match="cannot drop"):
        ledger.append(
            spark, t, region.select("r_regionkey"), merge_schema=True
        )
    with pytest.raises(ledger.LedgerError, match="cannot change"):
        ledger.append(
            spark,
            t,
            region.withColumn(
                "r_regionkey", F.col("r_regionkey").cast("string")
            ),
            merge_schema=True,
        )


# --------------------------------------------------------------------------
# OPTIMIZE ZORDER BY (multi-dimension stats clustering)
# --------------------------------------------------------------------------
def test_optimize_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """After z-order optimize on (o_custkey, o_totalprice), a narrow
    between-read on EITHER column must scan a strict subset of the
    groups — the property a single-column sort cannot give — and the
    snapshot must be row-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark,
        t,
        orders,
        key="o_orderkey",
        stats_cols=["o_custkey", "o_totalprice"],
    )
    n = orders.count()
    before = ledger.read(spark, t)
    ledger.optimize_zorder(
        spark,
        t,
        cluster_by=["o_custkey", "o_totalprice"],
        target_rows=max(1, n // 16),
    )
    m = ledger.history(t)[-1]
    assert m["op"] == "optimize"
    groups = m["groups"]
    assert len(groups) >= 4
    assert sum(g["rows"] for g in groups) == n

    after = ledger.read(spark, t)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0

    def scanned_groups(df):
        files = [
            r.file
            for r in df.select(F.input_file_name().alias("file"))
            .distinct()
            .collect()
        ]
        return {
            g["path"] for g in groups if any(g["path"] in f for f in files)
        }

    # Bands inside the lower half of each distribution: a band that
    # straddles the median crosses the z-curve's TOP bit and touches
    # every group by construction — that is expected z-order behavior,
    # not a pruning failure.
    stats = orders.agg(
        F.expr("percentile(o_custkey, 0.05)").alias("clo"),
        F.expr("percentile(o_custkey, 0.40)").alias("chi"),
        F.expr("percentile(o_totalprice, 0.05)").alias("plo"),
        F.expr("percentile(o_totalprice, 0.40)").alias("phi"),
    ).first()
    for col, lo, hi in [
        ("o_custkey", int(stats["clo"]), int(stats["chi"])),
        ("o_totalprice", stats["plo"], stats["phi"]),
    ]:
        got = ledger.read(spark, t, between={col: (lo, hi)})
        want = ledger.read(spark, t).filter(F.col(col).between(lo, hi))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert len(scanned_groups(got)) < len(groups), col


def test_optimize_zorder_rejects_unsupported(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,6)").alias("price_dec"),
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, orders, key="o_orderkey")
    with pytest.raises(ledger.LedgerError, match="numeric/date/timestamp"):
        ledger.optimize_zorder(spark, t, cluster_by=["price_dec"])
    with pytest.raises(ledger.LedgerError, match="not in schema"):
        ledger.optimize_zorder(spark, t, cluster_by=["nope"])
    with pytest.raises(ledger.LedgerError, match="non-empty"):
        ledger.optimize_zorder(spark, t, cluster_by=[])


def test_optimize_zorder_string_column(spark, sf_dir, tmp_path):
    """String clustering (sampled range boundaries): after a 1-D
    optimize on c_name, a name-range read scans a strict subset of
    groups and equals the plain filter."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, cust, key="c_custkey", stats_cols=["c_name"]
    )
    n = cust.count()
    before = ledger.read(spark, t)
    ledger.optimize_zorder(
        spark, t, cluster_by=["c_name"], target_rows=max(1, n // 8)
    )
    groups = ledger.history(t)[-1]["groups"]
    assert len(groups) >= 4

    after = ledger.read(spark, t)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0

    names = sorted(r.c_name for r in cust.select("c_name").collect())
    lo, hi = names[int(0.05 * len(names))], names[int(0.30 * len(names))]
    got = ledger.read(spark, t, between={"c_name": (lo, hi)})
    want = ledger.read(spark, t).filter(F.col("c_name").between(lo, hi))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    files = [
        r.file
        for r in got.select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    ]
    scanned = {
        g["path"] for g in groups if any(g["path"] in f for f in files)
    }
    assert len(scanned) < len(groups)


def test_changes_across_evolution_boundary(spark, sf_dir, tmp_path):
    """CDF spanning an add-column commit: both sides are compared under
    the wider schema, so an updated row appears as delete(old, NULL) +
    insert(new, value)."""
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, region, key="r_regionkey")
    delta = (
        region.filter("r_regionkey = 0")
        .withColumn("r_name", F.lit("RENAMED"))
        .withColumn("r_flag", F.lit(1))
    )
    ledger.merge(spark, t, delta, merge_schema=True)
    feed = ledger.changes(spark, t, 0, 1)
    assert feed.columns == [
        "r_regionkey", "r_name", "r_flag", "_change_type",
    ]
    ins = feed.filter("_change_type = 'insert'")
    dels = feed.filter("_change_type = 'delete'")
    assert ins.count() == 1 and dels.count() == 1
    assert ins.first()["r_name"] == "RENAMED" and ins.first()["r_flag"] == 1
    assert dels.first()["r_flag"] is None


def test_optimize_zorder_incremental_key_range(spark, sf_dir, tmp_path):
    """OPTIMIZE ... WHERE: only groups overlapping the key interval are
    rewritten; others carry over by reference; snapshot row-identical;
    a non-overlapping interval commits a no-op version."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 3000"), key="o_orderkey"
    )
    # Tail: many tiny appends above key 3000 (the streaming shape).
    for i in range(4):
        lo, hi = 3000 + i * 500, 3500 + i * 500
        ledger.append(
            spark,
            t,
            orders.filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}"),
        )
    before_groups = ledger.history(t)[-1]["groups"]
    before = ledger.read(spark, t)
    n = before.count()

    ledger.optimize_zorder(
        spark,
        t,
        ["o_totalprice"],
        target_rows=n,
        key_between=(3000, 10**9),
    )
    after_groups = ledger.history(t)[-1]["groups"]
    after_paths = {g["path"] for g in after_groups}
    # The head group (keys < 3000) is untouched; the four tail groups
    # are gone, replaced by the packed rewrite.
    assert before_groups[0]["path"] in after_paths
    assert all(
        g["path"] not in after_paths for g in before_groups[1:]
    )
    after = ledger.read(spark, t)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0

    # Non-overlapping interval: pure metadata no-op commit.
    v = ledger.optimize_zorder(
        spark, t, ["o_totalprice"], key_between=(10**9, 2 * 10**9)
    )
    assert ledger.history(t)[-1]["groups"] == after_groups
    assert ledger.history(t)[-1]["op"] == "optimize"
    assert v == ledger.latest_version(t)


# --------------------------------------------------------------------------
# Optimistic-concurrency retries
# --------------------------------------------------------------------------
def _racing_commit_once(state):
    """A _commit wrapper that, before delegating the FIRST time, lets a
    racer steal the target version — deterministically reproducing a
    lost optimistic-concurrency race."""
    real_commit = ledger._commit

    def wrapper(table, manifest):
        if not state["raced"]:
            state["raced"] = True
            parent = ledger._read_manifest(
                table, ledger.latest_version(table)
            )
            real_commit(
                table,
                ledger._new_manifest(parent, "append", parent["groups"]),
            )
        return real_commit(table, manifest)

    return wrapper


def test_append_retries_and_reuses_written_group(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A lost append race re-publishes the SAME written group against
    the new parent — no data rewrite, the append lands at the next
    version, and nothing is lost from either writer."""
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region.filter("r_regionkey < 3"))
    monkeypatch.setattr(
        ledger, "_commit", _racing_commit_once({"raced": False})
    )
    v = ledger.append(spark, t, region.filter("r_regionkey >= 3"))
    assert v == 2  # the racer took version 1
    assert [m["op"] for m in ledger.history(t)] == [
        "create", "append", "append",
    ]
    assert ledger.read(spark, t).count() == region.count()
    # Exactly one data group was written by our append (reused across
    # the retry): create's group + the appended group.
    assert len(ledger.history(t)[-1]["groups"]) == 2
    assert ledger.vacuum(t) == []  # no orphans from the retry


def test_merge_retries_by_recomputing(
    spark, sf_dir, tmp_path, monkeypatch, orders_slices
):
    """A lost merge race recomputes against the fresh parent; the
    failed attempt's group is a vacuum-able orphan and the final
    snapshot is the correct upsert."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    monkeypatch.setattr(
        ledger, "_commit", _racing_commit_once({"raced": False})
    )
    v = ledger.merge(spark, t, delta)
    assert v == 2
    expected = (
        snap.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(delta)
    )
    got = ledger.read(spark, t)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # The first attempt's written-then-unreferenced group is collected.
    assert len(ledger.vacuum(t, group_retention_s=0)) == 1
    assert ledger.read(spark, t).count() == expected.count()


def test_concurrent_appends_all_land_with_retries(spark, sf_dir, tmp_path):
    """REAL races, not injected: four threads each append three slices
    concurrently. Optimistic concurrency + append retries must land all
    twelve commits (create + 12 appends, every version a distinct
    parent chain) with no rows lost or duplicated."""
    import threading

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 1000"), key="o_orderkey"
    )
    slices = [
        (1000 + i * 500, 1500 + i * 500) for i in range(12)
    ]
    errors = []

    def worker(my):
        try:
            for lo, hi in my:
                ledger.append(
                    spark,
                    t,
                    orders.filter(
                        f"o_orderkey >= {lo} AND o_orderkey < {hi}"
                    ),
                    retries=50,
                )
        except Exception as ex:  # pragma: no cover - failure detail
            errors.append(ex)

    threads = [
        threading.Thread(target=worker, args=(slices[i::4],))
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    hist = ledger.history(t)
    assert [m["op"] for m in hist] == ["create"] + ["append"] * 12
    # Parent chain is gapless: every commit raced to a unique version.
    assert [m["version"] for m in hist] == list(range(13))
    got = ledger.read(spark, t)
    want = orders.filter("o_orderkey < 7000")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_restore_rolls_back_by_reference(
    spark, sf_dir, tmp_path, orders_slices
):
    """RESTORE after a bad merge: the new version references version
    0's groups verbatim (pure metadata), reads identically to the old
    snapshot, keeps the bad commit in history for audit, and survives
    expire+vacuum. Restoring across a schema evolution also restores
    the narrow schema."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    v0_groups = ledger.history(t)[-1]["groups"]
    ledger.merge(
        spark,
        t,
        delta.withColumn("oops", F.lit(1)),
        merge_schema=True,
    )  # the "bad" commit: changed rows AND widened schema

    v = ledger.restore(t, 0)
    assert v == 2
    m = ledger.history(t)[-1]
    assert m["op"] == "restore" and m["restored_from"] == 0
    assert [g["path"] for g in m["groups"]] == [
        g["path"] for g in v0_groups
    ]
    got = ledger.read(spark, t)
    assert got.columns == snap.columns  # evolution undone
    assert got.exceptAll(snap).count() == 0
    assert snap.exceptAll(got).count() == 0

    # The restored groups survive history cleanup (the restore manifest
    # references them); the bad merge's group is reclaimed.
    ledger.expire_history(t, keep_last=1)
    removed = ledger.vacuum(t, group_retention_s=0)
    assert len(removed) == 1
    assert ledger.read(spark, t).count() == snap.count()


def test_details_reports_clustering_quality(spark, sf_dir, tmp_path):
    """DESCRIBE DETAIL from the manifest alone: key_overlap is 0.0 for
    disjoint-range appends, rises when interleaved appends accumulate,
    and a key-clustered optimize drives it back to 0.0."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = str(tmp_path / "t")
    ledger.create(
        spark, t, orders.filter("o_orderkey < 2000"), key="o_orderkey"
    )
    ledger.append(
        spark, t, orders.filter("o_orderkey >= 2000 AND o_orderkey < 4000")
    )
    d = ledger.details(t)
    assert d["num_groups"] == 2 and d["key_overlap"] == 0.0
    assert d["key"] == "o_orderkey" and d["op"] == "append"
    assert d["rows"] == orders.filter("o_orderkey < 4000").count()
    assert d["columns"] == ["o_orderkey", "o_totalprice"]

    # Two interleaved appends (even/odd keys): every range overlaps.
    ledger.append(
        spark, t, orders.filter("o_orderkey >= 4000 AND o_orderkey % 2 = 0")
    )
    ledger.append(
        spark, t, orders.filter("o_orderkey >= 4000 AND o_orderkey % 2 = 1")
    )
    assert ledger.details(t)["key_overlap"] > 0.0

    n = ledger.read(spark, t).count()
    ledger.optimize_zorder(
        spark, t, ["o_orderkey"], target_rows=max(1, n // 8)
    )
    d = ledger.details(t)
    assert d["op"] == "optimize" and d["key_overlap"] == 0.0
    # Time travel: details of version 0 still describe the create.
    assert ledger.details(t, version=0)["op"] == "create"


def test_delete_where_keeps_null_predicate_rows(spark, sf_dir, tmp_path):
    """SQL DELETE removes rows where the predicate is TRUE; a NULL
    predicate keeps the row. The survivor rewrite must not turn
    NOT(NULL)=NULL into a silent drop — and the result must not depend
    on whether a NULL row shares a group with a true match."""
    rows = [(1, "x"), (2, None), (3, "y"), (4, None)]
    df = spark.createDataFrame(rows, "k int, c string")
    t = str(tmp_path / "t")
    # One group containing both a match and NULL rows.
    ledger.create(spark, t, df, key="k")
    ledger.delete_where(spark, t, "c = 'x'")
    got = sorted((r.k, r.c) for r in ledger.read(spark, t).collect())
    assert got == [(2, None), (3, "y"), (4, None)]


def test_read_between_datetime_bound_on_date_column(spark, sf_dir, tmp_path):
    """A datetime bound on a DATE stats column must prune consistently
    with Spark's residual coercion (date -> midnight): rows on the
    boundary date must survive."""
    import datetime

    rows = [
        (1, datetime.date(2020, 1, 4)),
        (2, datetime.date(2020, 1, 5)),
        (3, datetime.date(2020, 1, 7)),
    ]
    df = spark.createDataFrame(rows, "k int, d date")
    t = str(tmp_path / "t")
    ledger.create(spark, t, df, key="k", stats_cols=["d"])
    lo = datetime.datetime(2020, 1, 5, 0, 0, 0)
    hi = datetime.datetime(2020, 1, 6, 12, 0, 0)
    got = ledger.read(spark, t, between={"d": (lo, hi)})
    want = ledger.read(spark, t).filter(F.col("d").between(lo, hi))
    a = sorted(r.k for r in got.collect())
    b = sorted(r.k for r in want.collect())
    assert a == b == [2]


def test_optimize_zorder_four_columns_past_int_bits(
    spark, sf_dir, tmp_path
):
    """4 columns x 8 bits = 32 interleaved bits: the z-value must be
    built in LONG arithmetic (an int shift wraps at 31). Row identity
    and non-degenerate grouping are the assertions."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    t = str(tmp_path / "t")
    ledger.create(spark, t, orders, key="o_orderkey")
    n = orders.count()
    before = ledger.read(spark, t)
    ledger.optimize_zorder(
        spark,
        t,
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        target_rows=max(1, n // 8),
    )
    after = ledger.read(spark, t)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    groups = ledger.history(t)[-1]["groups"]
    assert len(groups) >= 4
    # With a sane 32-bit z-value the groups are ~equal-row cuts, not
    # one giant bucket of wrapped-negative z-values.
    sizes = sorted(g["rows"] for g in groups)
    assert sizes[-1] < n  # no single group swallowed everything
    with pytest.raises(ledger.LedgerError, match="63-bit"):
        ledger.optimize_zorder(
            spark, t, ["o_orderkey"] * 8, bits=8
        )


def test_vacuum_spares_recent_staging_dirs(spark, sf_dir, tmp_path):
    """A staging dir younger than the retention window belongs to a
    possibly-RUNNING rewrite and must survive vacuum; retention 0
    force-collects it."""
    region = load_table(spark, sf_dir, "region")
    t = str(tmp_path / "t")
    ledger.create(spark, t, region)
    staging = os.path.join(t, f"{ledger._STAGING_PREFIX}live")
    os.makedirs(staging)
    assert ledger.vacuum(t) == []  # default retention spares it
    assert os.path.isdir(staging)
    removed = ledger.vacuum(t, staging_retention_s=0)
    assert removed == [f"{ledger._STAGING_PREFIX}live"]
    assert not os.path.isdir(staging)


def test_vacuum_keys_retention_off_newest_inner_mtime(
    spark, sf_dir, tmp_path
):
    """A long rewrite creates its partition subdirs at the START, so the
    top-level staging mtime can age past the retention window while
    executors are still writing files inside — retention must key off
    the NEWEST mtime found anywhere under the dir (ADVICE r12)."""
    region = load_table(spark, sf_dir, "region")
    t = str(tmp_path / "t")
    ledger.create(spark, t, region)
    staging = os.path.join(t, f"{ledger._STAGING_PREFIX}slow")
    sub = os.path.join(staging, "part=0")
    os.makedirs(sub)
    # Age the dirs past the window, then land a FRESH executor file.
    old = ledger.time.time() - 7200
    os.utime(staging, (old, old))
    os.utime(sub, (old, old))
    fresh = os.path.join(sub, "data.parquet")
    with open(fresh, "w") as f:
        f.write("x")
    assert ledger.vacuum(t, staging_retention_s=3600) == []
    assert os.path.isdir(staging)  # in-flight rewrite spared
    # Now genuinely abandoned: EVERYTHING under it ages past the window
    # (creating the file refreshed its parent dir's mtime too).
    for p in (fresh, sub, staging):
        os.utime(p, (old, old))
    assert ledger.vacuum(t, staging_retention_s=3600) == [
        f"{ledger._STAGING_PREFIX}slow"
    ]


def test_read_intersects_key_between_and_between(
    spark, sf_dir, tmp_path, orders_slices
):
    """Passing BOTH key_between and between[key] must intersect the two
    closed intervals, not silently drop one (ADVICE r12)."""
    snap, _ = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    got = ledger.read(
        spark,
        t,
        key_between=(0, 2999),
        between={"o_orderkey": (1500, 5000)},
    )
    want = snap.filter("o_orderkey BETWEEN 1500 AND 2999")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # Disjoint intervals intersect to empty, never to either operand.
    assert (
        ledger.read(
            spark,
            t,
            key_between=(0, 100),
            between={"o_orderkey": (3000, 3999)},
        ).count()
        == 0
    )


def _evolving_racer_commit_once(state, spark):
    """Like _racing_commit_once, but the racer's stolen commit WIDENS
    the schema with its own new column — the concurrent-evolution race
    the retry loop must survive (ADVICE r12)."""
    from pyspark.sql.types import LongType, StructField, StructType

    real_commit = ledger._commit

    def wrapper(table, manifest):
        if not state["raced"]:
            state["raced"] = True
            parent = ledger._read_manifest(
                table, ledger.latest_version(table)
            )
            widened = StructType(
                list(StructType.fromJson(parent["schema"]))
                + [StructField("racer_col", LongType(), True)]
            )
            real_commit(
                table,
                ledger._new_manifest(
                    parent, "append", parent["groups"], schema=widened
                ),
            )
        return real_commit(table, manifest)

    return wrapper


def test_append_retry_survives_concurrent_evolution(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Retry after a racer added a DIFFERENT new column: the racer's
    column is not a 'drop' — it is NULL-filled for our rows (the same
    semantics readers give pre-evolution groups) and both new columns
    land in the final schema."""
    t = str(tmp_path / "t")
    region = load_table(spark, sf_dir, "region")
    ledger.create(spark, t, region.filter("r_regionkey < 3"))
    monkeypatch.setattr(
        ledger,
        "_commit",
        _evolving_racer_commit_once({"raced": False}, spark),
    )
    v = ledger.append(
        spark,
        t,
        region.filter("r_regionkey >= 3").withColumn(
            "my_col", F.lit(7).cast("long")
        ),
        merge_schema=True,
    )
    assert v == 2  # the racer took version 1
    got = ledger.read(spark, t)
    assert {"racer_col", "my_col"} <= set(got.columns)
    assert got.filter("racer_col IS NOT NULL").count() == 0
    assert got.filter("my_col = 7").count() == 2
    assert got.count() == region.count()


def test_merge_retry_survives_concurrent_evolution(
    spark, sf_dir, tmp_path, monkeypatch, orders_slices
):
    """The merge twin: the recomputed attempt reads the fresh parent's
    widened schema and NULL-fills the racer's column in the source."""
    snap, delta = orders_slices
    t = str(tmp_path / "t")
    ledger.create(spark, t, snap, key="o_orderkey")
    monkeypatch.setattr(
        ledger,
        "_commit",
        _evolving_racer_commit_once({"raced": False}, spark),
    )
    v = ledger.merge(
        spark,
        t,
        delta.withColumn("my_col", F.lit(1).cast("long")),
        merge_schema=True,
    )
    assert v == 2
    got = ledger.read(spark, t)
    assert {"racer_col", "my_col"} <= set(got.columns)
    expected_n = (
        snap.join(delta.select("o_orderkey"), "o_orderkey", "left_anti")
        .count()
        + delta.count()
    )
    assert got.count() == expected_n
    assert got.filter("racer_col IS NOT NULL").count() == 0
    assert got.filter("my_col = 1").count() == delta.count()


# --------------------------------------------------------------------------
# Metadata plane: delta manifests + checkpoints (r13)
# --------------------------------------------------------------------------


def _mk_row_df(spark, k):
    return spark.createDataFrame([(k, f"v{k}")], "k long, v string")


def test_commits_are_delta_manifests(spark, tmp_path):
    """Post-create manifests on disk carry add/remove, never the full
    group list — commit JSON is O(delta), not O(#groups)."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, 5):
        ledger.append(spark, t, _mk_row_df(spark, i))
    raw0 = ledger._read_raw(t, 0)
    assert "groups" in raw0  # create is the full base anchor
    for v in range(1, 5):
        raw = ledger._read_raw(t, v)
        assert "groups" not in raw
        assert len(raw["add"]) == 1 and "remove" not in raw
    # Manifest size does not grow with accumulated group count.
    import os as _os

    sz = [
        _os.path.getsize(
            _os.path.join(ledger._ledger_path(t), ledger._manifest_name(v))
        )
        for v in range(1, 5)
    ]
    assert max(sz) <= 2 * min(sz)


def test_checkpoint_written_at_interval_and_resolution_matches(
    spark, tmp_path
):
    """Every CHECKPOINT_INTERVALth commit materializes a checkpoint and
    advances _last_checkpoint; resolution at any version (across the
    checkpoint boundary, time travel included) equals the snapshot the
    full-manifest format would have given."""
    import os as _os

    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    n = ledger.CHECKPOINT_INTERVAL + 3
    for i in range(1, n + 1):
        ledger.append(spark, t, _mk_row_df(spark, i))
    cv = ledger.CHECKPOINT_INTERVAL
    assert _os.path.exists(
        _os.path.join(ledger._ledger_path(t), ledger._checkpoint_name(cv))
    )
    assert ledger.last_checkpoint(t) == cv
    # Any version resolves to exactly i+1 rows with the right contents.
    for v in (0, cv - 1, cv, cv + 1, n):
        got = sorted(
            r["k"] for r in ledger.read(spark, t, version=v).collect()
        )
        assert got == list(range(v + 1)), v
    # Group accounting at latest: one group per commit.
    assert len(ledger._read_manifest(t, n)["groups"]) == n + 1


def test_missing_checkpoint_only_lengthens_the_walk(spark, tmp_path):
    """A crash between manifest link and checkpoint write loses the
    checkpoint, never correctness: resolution walks past the gap to the
    older anchor."""
    import os as _os

    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    n = ledger.CHECKPOINT_INTERVAL + 2
    for i in range(1, n + 1):
        ledger.append(spark, t, _mk_row_df(spark, i))
    _os.unlink(
        _os.path.join(
            ledger._ledger_path(t),
            ledger._checkpoint_name(ledger.CHECKPOINT_INTERVAL),
        )
    )
    ledger._RESOLVE_CACHE.clear()
    got = sorted(r["k"] for r in ledger.read(spark, t).collect())
    assert got == list(range(n + 1))


def test_expire_history_anchors_oldest_kept_version(spark, tmp_path):
    """Expiring past a delta chain materializes a checkpoint at the
    oldest KEPT version first — every kept version stays resolvable
    with no reference to the deleted manifests."""
    import os as _os

    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, 8):
        ledger.append(spark, t, _mk_row_df(spark, i))
    # keep versions 5..7 — none is a checkpoint version (interval 10)
    expired = ledger.expire_history(t, keep_last=3)
    assert expired == [0, 1, 2, 3, 4]
    assert _os.path.exists(
        _os.path.join(ledger._ledger_path(t), ledger._checkpoint_name(5))
    )
    ledger._RESOLVE_CACHE.clear()
    for v in (5, 6, 7):
        got = sorted(
            r["k"] for r in ledger.read(spark, t, version=v).collect()
        )
        assert got == list(range(v + 1))
    # vacuum still resolves the kept chain and collects nothing live.
    assert ledger.vacuum(t) == []


def test_latest_txn_reads_checkpoint_map_not_expired_history(
    spark, tmp_path
):
    """The per-app txn high-water survives expiry of the manifests that
    carried the txn actions (the checkpoint accumulates the map), and
    lookups do not scan the whole chain."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, ledger.CHECKPOINT_INTERVAL + 2):
        txn = {"app": "job", "batch": i} if i <= 3 else None
        ledger.append(spark, t, _mk_row_df(spark, i), txn=txn)
    assert ledger.latest_txn(t, "job") == 3
    assert ledger.latest_txn(t, "nobody") is None
    # Expire the versions that carried the txn actions; the checkpoint
    # at CHECKPOINT_INTERVAL still knows the high water.
    ledger.expire_history(t, keep_last=2)
    ledger._RESOLVE_CACHE.clear()
    assert ledger.latest_txn(t, "job") == 3


def test_resolve_cache_misses_on_recreated_table(spark, tmp_path):
    """Deleting a table directory and creating a different table at the
    SAME path must not serve stale cached state (cache keys carry the
    manifest file identity)."""
    import shutil as _shutil

    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 1), key="k")
    assert [r["k"] for r in ledger.read(spark, t).collect()] == [1]
    _shutil.rmtree(t)
    ledger.create(spark, t, _mk_row_df(spark, 99), key="k")
    assert [r["k"] for r in ledger.read(spark, t).collect()] == [99]


def test_restore_annotation_survives_delta_roundtrip(spark, tmp_path):
    """Per-commit annotations (restored_from) ride the delta manifest
    and reappear on the resolved state — including when resolved from a
    checkpoint at that exact version."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, ledger.CHECKPOINT_INTERVAL):
        ledger.append(spark, t, _mk_row_df(spark, i))
    v = ledger.restore(t, 0)  # lands exactly on the checkpoint version
    assert v == ledger.CHECKPOINT_INTERVAL
    ledger._RESOLVE_CACHE.clear()
    m = ledger._read_manifest(t, v)
    assert m["op"] == "restore" and m["restored_from"] == 0
    assert [r["k"] for r in ledger.read(spark, t).collect()] == [0]


def test_checkpoint_io_failure_does_not_fail_the_commit(
    spark, tmp_path, monkeypatch
):
    """The manifest link IS the commit point; a checkpoint I/O failure
    after it must not surface (callers would retry — and double-apply —
    a write that landed). The lost checkpoint only lengthens walks."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")

    def boom(table, version):
        raise OSError("disk full")

    monkeypatch.setattr(ledger, "_write_checkpoint", boom)
    for i in range(1, ledger.CHECKPOINT_INTERVAL + 1):
        ledger.append(spark, t, _mk_row_df(spark, i))  # v10 checkpoints
    monkeypatch.undo()
    assert ledger.last_checkpoint(t) is None
    ledger._RESOLVE_CACHE.clear()
    got = sorted(r["k"] for r in ledger.read(spark, t).collect())
    assert got == list(range(ledger.CHECKPOINT_INTERVAL + 1))


def test_resolution_walk_survives_concurrent_expire(
    spark, tmp_path, monkeypatch
):
    """expire_history deleting a parent delta UNDER a running walk: the
    walk retries once and finds the checkpoint expire materialized at
    the oldest kept version (code-review r13 repro)."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, 8):
        ledger.append(spark, t, _mk_row_df(spark, i))
    ledger._RESOLVE_CACHE.clear()
    real_read_raw = ledger._read_raw
    state = {"fired": False}

    def racing_read_raw(table, version):
        if version == 4 and not state["fired"]:
            state["fired"] = True
            # The concurrent janitor wins the race mid-walk: it anchors
            # the kept chain at v5, then deletes manifests 0..4.
            ledger.expire_history(table, keep_last=3)
        return real_read_raw(table, version)

    monkeypatch.setattr(ledger, "_read_raw", racing_read_raw)
    got = sorted(r["k"] for r in ledger.read(spark, t, version=7).collect())
    assert got == list(range(8))
    assert state["fired"]  # the race actually happened


def test_resolve_cache_bounds_total_group_entries(monkeypatch):
    """The cache budget is group entries, not just states — a count-only
    cap would pin O(256 x #groups) driver memory at the 100k-group tier
    (code-review r13)."""
    monkeypatch.setattr(ledger, "_RESOLVE_CACHE", {})
    big = {"groups": [{"path": f"p{i}"} for i in range(300_000)]}
    small = {"groups": [{"path": "q"}]}
    ledger._cache_put(("t", 1, 0, 0), big)
    ledger._cache_put(("t", 2, 0, 0), small)
    # big (300k) + a second big (300k) would exceed the 500k budget:
    ledger._cache_put(("t", 3, 0, 0), dict(big))
    total = sum(
        len(s["groups"]) for s in ledger._RESOLVE_CACHE.values()
    )
    assert total <= ledger._RESOLVE_CACHE_GROUP_CAP
    assert ("t", 3, 0, 0) in ledger._RESOLVE_CACHE  # newest always kept


def _drive_model_sequence(spark, table_path: str, seed: int, steps: int = 28):
    """The model-based random-op walk, extracted so extra seeds can run
    ad hoc (opt-in below) without duplicating the op table."""
    import random

    rng = random.Random(seed)
    t = table_path

    def df_of(rows):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(rows.items())], "k long, v long"
        )

    # model: dict key -> value; snapshots[version] = dict copy or None
    # for versions whose exact state we no longer track (expired).
    state = {k: k * 10 for k in range(6)}
    ledger.create(spark, t, df_of(state), key="k")
    snapshots = {0: dict(state)}
    txn_hw = None
    next_key = 100

    for step in range(steps):
        op = rng.choice(
            ["append", "merge", "delete", "restore", "expire",
             "lose_chk", "clear_cache"]
        )
        if op == "append":
            rows = {next_key + i: rng.randrange(1000) for i in range(3)}
            next_key += 10
            txn = None
            if rng.random() < 0.5:
                b = (txn_hw or 0) + 1
                txn = {"app": "model", "batch": b}
                txn_hw = b
            v = ledger.append(spark, t, df_of(rows), txn=txn)
            state.update(rows)
            snapshots[v] = dict(state)
        elif op == "merge":
            keys = rng.sample(sorted(state), k=min(2, len(state)))
            rows = {k: rng.randrange(1000) for k in keys}
            rows[next_key] = rng.randrange(1000)
            next_key += 10
            v = ledger.merge(spark, t, df_of(rows))
            state.update(rows)
            snapshots[v] = dict(state)
        elif op == "delete":
            if len(state) < 4:
                continue
            cut = rng.choice(sorted(state))
            v = ledger.delete_where(spark, t, f"k = {cut}")
            state.pop(cut, None)
            snapshots[v] = dict(state)
        elif op == "restore":
            candidates = [
                v for v, s in snapshots.items()
                if s is not None and v in ledger._versions(t)
            ]
            if not candidates:
                continue
            back = rng.choice(candidates)
            v = ledger.restore(t, back)
            state = dict(snapshots[back])
            snapshots[v] = dict(state)
        elif op == "expire":
            if len(ledger._versions(t)) < 6 or rng.random() < 0.5:
                continue
            expired = ledger.expire_history(t, keep_last=4)
            for v in expired:
                snapshots[v] = None
        elif op == "lose_chk":
            # A crash may lose any checkpoint EXCEPT an expiry anchor
            # (losing that genuinely orphans the kept chain — expiry
            # deletes the parents the walk would otherwise use).
            vs = ledger._versions(t)
            losable = [
                v for v in vs
                if v > min(vs)
                and ledger._read_checkpoint(t, v) is not None
            ]
            if losable:
                v = rng.choice(losable)
                os.unlink(
                    os.path.join(
                        ledger._ledger_path(t), ledger._checkpoint_name(v)
                    )
                )
                ledger._RESOLVE_CACHE.clear()
        elif op == "clear_cache":
            ledger._RESOLVE_CACHE.clear()

        got = {
            r["k"]: r["v"] for r in ledger.read(spark, t).collect()
        }
        assert got == state, f"step {step} op {op}"

    # Final sweep: every kept version time-travels to its model state.
    ledger._RESOLVE_CACHE.clear()
    for v in ledger._versions(t):
        want = snapshots.get(v)
        if want is None:
            continue
        got = {
            r["k"]: r["v"]
            for r in ledger.read(spark, t, version=v).collect()
        }
        assert got == want, f"time travel to v{v}"
    assert ledger.latest_txn(t, "model") == txn_hw


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check of the delta/checkpoint resolution layer: a
    seeded random sequence of append / merge / delete_where / restore /
    expire_history / checkpoint loss / cache clears against an
    in-Python model of full-snapshot semantics. After every op, the
    latest snapshot must equal the model; at the end, every KEPT
    version must time-travel to its recorded model state and latest_txn
    must equal the model's high water. This is the test the old
    full-manifest format passed trivially (each version was a file);
    the resolution walk has to EARN it."""
    _drive_model_sequence(spark, str(tmp_path / "t"), seed=1309)


_FUZZ_SEEDS = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_LEDGER_FUZZ_SEEDS", "").split(",")
    if s.strip()
]


@pytest.mark.parametrize("seed", _FUZZ_SEEDS or [None])
def test_model_based_random_op_sequences_extra_seeds(spark, tmp_path, seed):
    """Opt-in longer fuzz walks over fresh seeds (the r13/r14 lesson:
    extra ad-hoc seeds on the model tests keep paying):
    ``SPARK_GRAFT_LEDGER_FUZZ_SEEDS=1,2,3 pytest -k extra_seeds``.
    40 steps per seed vs the pinned test's 28 — deeper
    expire/restore/checkpoint-loss interleavings."""
    if seed is None:
        pytest.skip("opt-in: set SPARK_GRAFT_LEDGER_FUZZ_SEEDS=1,2,3")
    _drive_model_sequence(spark, str(tmp_path / f"t{seed}"), seed, steps=40)


def test_details_reports_metadata_plane(spark, tmp_path):
    """DESCRIBE DETAIL surfaces checkpoint health: the newest checkpoint
    version, the delta-walk distance, and the manifest count."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, ledger.CHECKPOINT_INTERVAL + 3):
        ledger.append(spark, t, _mk_row_df(spark, i))
    d = ledger.details(t)
    assert d["last_checkpoint"] == ledger.CHECKPOINT_INTERVAL
    assert d["versions_since_checkpoint"] == 2
    assert d["num_versions"] == ledger.CHECKPOINT_INTERVAL + 3


@pytest.mark.parametrize("exc", [ledger.LedgerError, ValueError])
def test_checkpoint_nonio_failure_does_not_fail_the_commit(
    spark, tmp_path, monkeypatch, exc
):
    """r13-advice regression: _write_checkpoint resolves state, so it
    can raise LedgerError (concurrently-expired or corrupt chain) or
    ValueError (bad JSON) — not just OSError. Any of them escaping
    _commit would make the caller treat a LANDED write as failed (the
    double-apply hazard the OSError guard already documents)."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")

    def boom(table, version):
        raise exc("checkpoint resolution failed")

    monkeypatch.setattr(ledger, "_write_checkpoint", boom)
    for i in range(1, ledger.CHECKPOINT_INTERVAL + 1):
        ledger.append(spark, t, _mk_row_df(spark, i))  # v10 checkpoints
    monkeypatch.undo()
    assert ledger.last_checkpoint(t) is None
    ledger._RESOLVE_CACHE.clear()
    got = sorted(r["k"] for r in ledger.read(spark, t).collect())
    assert got == list(range(ledger.CHECKPOINT_INTERVAL + 1))


def _legacyize(table, version):
    """Rewrite one on-disk manifest as a pre-delta-format FULL snapshot
    (the legacy shape: resolved state inline, no add/remove)."""
    import json as _json

    m = ledger._read_manifest(table, version)
    payload = {
        k: v for k, v in m.items() if k not in ("txns", "txns_complete")
    }
    p = os.path.join(
        ledger._ledger_path(table), ledger._manifest_name(version)
    )
    with open(p, "w") as fh:
        _json.dump(payload, fh)
    ledger._RESOLVE_CACHE.clear()


def test_expire_history_rewinds_dangling_checkpoint_pointer(
    spark, tmp_path
):
    """r13-advice regression: when the oldest KEPT version is a full
    (legacy) manifest, expire_history materializes no fresh checkpoint —
    deleting the expired ones must then rewind (here: remove) the
    _last_checkpoint pointer instead of leaving it dangling at a deleted
    file, which would make last_checkpoint()/details() report a phantom
    checkpoint."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    for i in range(1, ledger.CHECKPOINT_INTERVAL + 3):
        ledger.append(spark, t, _mk_row_df(spark, i))  # chk at v10
    assert ledger.last_checkpoint(t) == ledger.CHECKPOINT_INTERVAL
    # Make the two newest manifests legacy-full, then keep only them.
    _legacyize(t, ledger.CHECKPOINT_INTERVAL + 1)
    _legacyize(t, ledger.CHECKPOINT_INTERVAL + 2)
    ledger.expire_history(t, keep_last=2)
    # The pointer no longer names a deleted checkpoint file...
    ptr = ledger.last_checkpoint(t)
    if ptr is not None:
        assert os.path.exists(
            os.path.join(ledger._ledger_path(t), ledger._checkpoint_name(ptr))
        )
    # ...details() agrees, and the kept chain still resolves.
    d = ledger.details(t)
    assert d["last_checkpoint"] == ptr
    ledger._RESOLVE_CACHE.clear()
    got = sorted(r["k"] for r in ledger.read(spark, t).collect())
    assert got == list(range(ledger.CHECKPOINT_INTERVAL + 3))


def test_cache_key_misses_on_recreated_manifest_same_tick(spark, tmp_path):
    """r13-advice regression: a table deleted and recreated at the same
    path can reproduce (version, size) within one mtime-clock tick —
    the cache key must still miss (st_ino/st_dev), or readers get the
    OLD table's state pointing at deleted data dirs."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 1), key="k")
    p = os.path.join(ledger._ledger_path(t), ledger._manifest_name(0))
    k1 = ledger._cache_key(t, 0)
    st = os.stat(p)
    content = open(p).read()
    # Recreate via a coexisting temp file (guaranteed distinct inode),
    # then force the SAME mtime tick and size as the original.
    tmp = p + ".recreate"
    with open(tmp, "w") as fh:
        fh.write(content)
    os.replace(tmp, p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    k2 = ledger._cache_key(t, 0)
    st2 = os.stat(p)
    assert (st2.st_mtime_ns, st2.st_size) == (st.st_mtime_ns, st.st_size)
    assert k1 != k2


def _drive_concurrent_writers(spark, table_path: str, seed_a: int, seed_b: int):
    """The racing-writers walk, extracted so extra seed pairs can run
    ad hoc (opt-in below) without duplicating the op table."""
    import random
    import threading

    t = table_path

    def df_of(rows):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(rows.items())], "k long, v long"
        )

    ledger.create(spark, t, df_of({0: 0}), key="k")
    landed: list[tuple[int, dict]] = []
    lock = threading.Lock()
    errors: list[Exception] = []

    def worker(seed, base):
        rng = random.Random(seed)
        nk = base
        try:
            for _ in range(6):
                if rng.random() < 0.5:
                    rows = {nk + j: rng.randrange(1000) for j in range(2)}
                    v = ledger.append(spark, t, df_of(rows), retries=12)
                else:
                    rows = {0: rng.randrange(1000), nk: rng.randrange(1000)}
                    # Contention is the POINT here: with two writers
                    # racing every commit, the default retry budget can
                    # legitimately exhaust under load — give the test
                    # enough attempts that only a LOST update (not a
                    # lost race) can fail it.
                    v = ledger.merge(spark, t, df_of(rows), retries=12)
                nk += 10
                with lock:
                    landed.append((v, rows))
        except Exception as e:  # surfaced after join
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(seed_a, 1000)),
        threading.Thread(target=worker, args=(seed_b, 2000)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    versions = sorted(v for v, _ in landed)
    # Linearized, gapless, no version handed to two writers.
    assert versions == list(range(1, 13)), versions

    state = {0: 0}
    snapshots = {0: dict(state)}
    for v, rows in sorted(landed):
        state.update(rows)
        snapshots[v] = dict(state)

    ledger._RESOLVE_CACHE.clear()
    got = {r["k"]: r["v"] for r in ledger.read(spark, t).collect()}
    assert got == state
    # Every intermediate version time-travels to its model state.
    for v in ledger._versions(t):
        got_v = {
            r["k"]: r["v"]
            for r in ledger.read(spark, t, version=v).collect()
        }
        assert got_v == snapshots[v], f"time travel to v{v}"


def test_model_based_concurrent_writer_interleavings(spark, tmp_path):
    """Model-based RACING writers (r13 stretch item): two threads each
    drive a seeded append/merge sequence against the same table with no
    external coordination. Optimistic concurrency must linearize them
    into a gapless version history whose per-version states equal an
    in-Python model replaying each landed commit's effect in version
    order — append adds thread-unique keys, merge upserts (a shared hot
    key + a fresh one), so the fold over the LANDED order is the exact
    oracle regardless of interleaving."""
    _drive_concurrent_writers(spark, str(tmp_path / "t"), 1401, 1402)


@pytest.mark.parametrize("seed", _FUZZ_SEEDS or [None])
def test_model_based_concurrent_writer_extra_seeds(spark, tmp_path, seed):
    """Opt-in extra interleavings for the racing-writers model (same
    env hook as the resolution-layer walk): each seed drives a distinct
    (seed, seed+5000) thread pair — thread scheduling adds its own
    nondeterminism on top, so repeats of one seed also explore."""
    if seed is None:
        pytest.skip("opt-in: set SPARK_GRAFT_LEDGER_FUZZ_SEEDS=1,2,3")
    _drive_concurrent_writers(
        spark, str(tmp_path / f"t{seed}"), seed, seed + 5000
    )


def test_txn_guard_is_atomic_with_the_commit(spark, tmp_path, monkeypatch):
    """code-review r14 (the zombie-driver TOCTOU): a writer whose
    pre-flight latest_txn check passed BEFORE it stalled must still be
    rejected at commit time — the txn freshness check runs against the
    exact parent the commit links onto, not only as a pre-flight."""
    t = str(tmp_path / "t")
    ledger.create(spark, t, _mk_row_df(spark, 0), key="k")
    ledger.merge(spark, t, _mk_row_df(spark, 1), txn={"app": "s", "batch": 10})
    ledger.merge(spark, t, _mk_row_df(spark, 2), txn={"app": "s", "batch": 12})
    before = {r["k"]: r["v"] for r in ledger.read(spark, t).collect()}

    # The zombie: batch 10 re-applied directly (its stale pre-flight
    # already "passed"); the in-commit guard must reject it even though
    # there is NO version collision.
    with pytest.raises(ledger.TxnAlreadyApplied, match="batch=10"):
        ledger.merge(
            spark, t,
            _mk_row_df(spark, 1).withColumn("v", F.lit("stale")),
            txn={"app": "s", "batch": 10},
        )
    ledger._RESOLVE_CACHE.clear()
    after = {r["k"]: r["v"] for r in ledger.read(spark, t).collect()}
    assert after == before  # nothing landed

    # A fresh batch and an unrelated app still commit.
    assert ledger.merge(
        spark, t, _mk_row_df(spark, 3), txn={"app": "s", "batch": 13}
    ) > 0
    assert ledger.append(
        spark, t, _mk_row_df(spark, 4), txn={"app": "other", "batch": 1}
    ) > 0
    # append under the same app/batch is rejected the same way.
    with pytest.raises(ledger.TxnAlreadyApplied):
        ledger.append(
            spark, t, _mk_row_df(spark, 5), txn={"app": "other", "batch": 1}
        )
