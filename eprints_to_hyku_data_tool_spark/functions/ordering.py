"""Scale-safe global ordering (SURVEY §2.6).

A bare ``Window.orderBy(...)`` with no partition key funnels the whole
dataset through ONE task — the classic global-row_number bottleneck. For
unique sort keys the total order is unique, so positions can be computed
distributed:

1. range-partition + sort locally on the full key (one shuffle, the same
   one a global sort needs anyway — and since r15 the ONLY full-data
   movement: the old per-pid rank window made Catalyst insert a second
   hashpartitioning(__pid) exchange + re-sort);
2. local ranks per physical partition from monotonically_increasing_id
   projected over the sorted rows (a per-row counter in row order;
   its +1-per-row contiguity is asserted in-plan per partition);
3. per-partition row counts + min/max id -> cumulative offsets (one tiny
   aggregate, #partitions rows) broadcast-joined back;
4. position = offset + (id - partition min id) + 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType
from pyspark.sql.window import Window

# Internal column names these helpers add; an input already carrying one
# would be silently overwritten and the offsets corrupted (the same
# failure mode skew.py rejects loudly — code-review r13).
_RESERVED = {"__pid", "__rank", "__lcum", "__n", "__offset", "__mid", "__m0", "__mn"}

_INTEGRAL_TYPES = {"byte", "short", "integer", "long"}

# Cap on rows per range partition. Historically row_number's
# IntegerType ceiling; the r15 monotonically_increasing_id ranks are
# long arithmetic but the id's low 33 bits wrap INTO the partition bits
# past 2^33 rows, so a cap (kept at the stricter 2^31, the documented
# remedy threshold) still guards correctness loudly.
_MAX_PARTITION_ROWS = 2**31 - 1

# py4j handles of every live pin (see release_pins). Tiny: one handle
# per kernel call, never the data.
_LIVE_PINS: list = []


def _pin_partitions(local: DataFrame) -> DataFrame:
    """Pin the range-shuffled/ranked subplan ONCE (persist) so the
    offsets aggregate and the final join consume the SAME physical
    partitioning.

    Without this, correctness rode on Catalyst's exchange reuse
    (code-review r15): the counts branch and the join branch each embed
    the repartitionByRange subtree, and with reuse disabled
    (spark.sql.exchange.reuse=false — a real debugging/AQE-workaround
    knob) each evaluation runs its OWN RangePartitioner boundary
    sampling, seeded per RDD — rows land in different __pid partitions
    on each side and positions come out silently wrong.

    persist(), not a checkpoint: the cache manager canonicalizes both
    branches onto ONE InMemoryRelation (one underlying RDD, one
    boundary sampling — verified consistent under reuse=false), lineage
    survives so an evicted/lost block recomputes through the SAME
    shuffle dependency (boundaries are fixed at RDD creation — no
    reliable-checkpoint dir needed for fault tolerance), and the
    range-partitioning stays VISIBLE in the final plan, which the
    plan-shape tests assert (a checkpoint's LogicalRDD boundary hid
    it). Blocks are MEMORY_AND_DISK, so a pin larger than executor
    memory spills rather than OOMs.

    Lifecycle (probed, not assumed — code-review r15 second pass): the
    CacheManager holds a STRONG reference to the InMemoryRelation, so a
    pin is NOT freed when the Python frames are GC'd (the ContextCleaner
    weak-ref path applies to raw-RDD persist/checkpoint, not Dataset
    cache entries — getPersistentRDDs stays non-empty after gc.collect).
    Auto-release tied to the result's GC would be WRONG: the common
    ``with_global_position(df, ...).filter(...)`` drops the intermediate
    immediately, and an early unpersist on a not-yet-executed derived
    plan re-opens the reuse=false double-sampling bug above. A batch
    session therefore accumulates one cached sort per kernel call until
    session end (clearCache) — bounded and harmless for query-at-a-time
    use; long-lived services and repeat-measurement harnesses call
    release_pins() at batch boundaries. Cost: one materialization of
    data a global sort had to shuffle anyway."""
    pinned = local.persist()
    _LIVE_PINS.append(pinned._jdf)
    return pinned


def release_pins() -> int:
    """Unpersist every pin created by this module and return how many.

    Call ONLY at a batch boundary: when no lazy DataFrame derived from
    an earlier with_global_position/with_global_cumsum result remains
    un-executed (unpersisting earlier re-opens the exchange-reuse
    double-sampling hazard _pin_partitions documents — the pin must
    outlive every plan that embeds it, and only the caller knows when
    that is). Safe against a stopped session (handles are dropped
    either way)."""
    n = 0
    while _LIVE_PINS:
        jdf = _LIVE_PINS.pop()
        try:
            jdf.unpersist(False)
            n += 1
        except Exception:  # session already stopped / handle dead
            pass
    return n


def _check_columns(df: DataFrame, out_col: str, what: str) -> None:
    clash = (_RESERVED | {out_col}) & set(df.columns)
    if clash:
        raise ValueError(
            f"{what} would silently overwrite input column(s) "
            f"{sorted(clash)}; rename them first"
        )


def with_global_position(
    df: DataFrame, order_exprs: list[Column], position_col: str = "position"
) -> DataFrame:
    """Add a 1-based global position under a total order.

    The order keys must be unique in combination (add a tie-break id) —
    uniqueness is what makes the total order, and hence the positions,
    well-defined regardless of where range boundaries fall.

    Per-RANGE-PARTITION row counts must stay below 2^31; a partition
    past that raises with a remedy instead of wrapping — raise
    spark.sql.shuffle.partitions so the range split is finer.
    """
    _check_columns(df, position_col, "with_global_position")
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(
        *order_exprs
    )
    # Local ranks WITHOUT a second full-data exchange (r15): the old
    # form ranked with row_number() over Window.partitionBy(__pid),
    # and Catalyst — which cannot know that spark_partition_id() is
    # trivially "already clustered by itself" — inserted a SECOND
    # full-data hashpartitioning(__pid) Exchange plus a full re-Sort
    # above the range shuffle (the r15 before-plan), doubling the
    # kernel's data movement and falsifying the module docstring's
    # "one shuffle, the same one a global sort needs anyway". Instead,
    # project monotonically_increasing_id() over the range-sorted
    # partitions: within a partition it is a per-row counter assigned
    # in row (= sorted) order, so local rank = __mid - min(__mid) + 1,
    # and the per-partition min rides the SAME tiny counts aggregate
    # the offsets already need — zero extra data movement. The id's
    # per-partition-contiguity contract (+1 per row) is asserted
    # in-plan: max(__mid) - min(__mid) == n - 1 per partition, checked
    # on the same guarded projection as the overflow cap, so a Spark
    # that ever changed the increment fails loudly instead of emitting
    # wrong positions.
    local = _pin_partitions(
        ranged.withColumn("__pid", F.spark_partition_id()).withColumn(
            "__mid", F.monotonically_increasing_id()
        )
    )
    counts = (
        local.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("__mid").alias("__m0"),
            F.max("__mid").alias("__mn"),
        )
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    # bounded-global-window: #partitions-row offsets table
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset", "__n", "__m0", "__mn")
    )
    # LONG, not int: this helper exists precisely for inputs too big for
    # a single-task global sort — an int cast would CAST_OVERFLOW (ANSI)
    # at 2^31 rows, exactly the scale it targets. The per-partition
    # guard rides the SAME projection as the position (a separate
    # assert column would be pruned away as unused).
    pos = (
        F.col("__offset") + (F.col("__mid") - F.col("__m0")) + F.lit(1)
    ).cast("long")
    guarded = F.when(
        (F.col("__n") <= F.lit(_MAX_PARTITION_ROWS))
        & (F.col("__mn") - F.col("__m0") == F.col("__n") - F.lit(1)),
        pos,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "with_global_position: a range partition holds "
                ),
                F.col("__n").cast("string"),
                F.lit(
                    " rows — past the per-partition position limit (or "
                    "monotonically_increasing_id lost its +1-per-row "
                    "contiguity contract); raise "
                    "spark.sql.shuffle.partitions for a finer range split"
                ),
            )
        ).cast("long")
    )
    return (
        local.join(F.broadcast(counts), "__pid")
        .withColumn(position_col, guarded)
        .drop("__pid", "__mid", "__offset", "__n", "__m0", "__mn")
    )


def exact_int_div(a: Column, b: Column) -> Column:
    """Integer division of non-negative longs as (a - a%b)/b: the
    numerator is exactly divisible, so the double division is exact for
    any value < 2^53 — a bare floor(a/b) can err by one ulp near
    integer boundaries at 1e11+ magnitudes."""
    return ((a - a % b) / b).cast("long")


def ntile_bucket(pos: Column, n_total: Column, nbins: int) -> Column:
    """0-based SQL ntile(nbins) bucket from a 1-based global position —
    the TRUE ntile mapping: with q = n div B and r = n mod B the first
    r buckets hold q+1 rows, the rest q, so
    bucket = (pos-1) div (q+1)            if pos <= r*(q+1)
           = r + (pos-1-r*(q+1)) div q    otherwise.
    (The floor((pos-1)*B/n) shortcut agrees ONLY when B divides n —
    ADVICE r5; regression-tested against DuckDB's ntile in
    tests/test_plans.py for non-divisible n.) The division by q in the
    otherwise-branch is unreachable when q = 0 (then r = n and every
    pos <= r*(q+1)) and CaseWhen short-circuits per row, but
    greatest(q, 1) keeps the expression total anyway."""
    qq = exact_int_div(n_total, F.lit(nbins))
    rr = (n_total % nbins).cast("long")
    p0 = (pos - 1).cast("long")
    return (
        F.when(pos <= rr * (qq + 1), exact_int_div(p0, qq + 1))
        .otherwise(
            rr + exact_int_div(p0 - rr * (qq + 1), F.greatest(qq, F.lit(1)))
        )
        .cast("int")
    )


def with_global_cumsum(
    df: DataFrame,
    order_exprs: list[Column],
    value_col: str,
    cumsum_col: str = "cumsum",
) -> DataFrame:
    """Add an EXCLUSIVE running sum of ``value_col`` under a total order
    (each row sees the sum of all strictly-earlier rows; the first row
    gets 0) without funneling the data through one task.

    Same two-phase scheme as :func:`with_global_position`: range-partition
    on the (unique) order keys, local exclusive cumsum per physical
    partition, then broadcast per-partition totals as offsets. The only
    full-data movement is the range shuffle a global sort needs anyway;
    the offsets table is #partitions rows.

    ``value_col`` must be integral — ENFORCED here, not just documented:
    a double input would be truncated per partition independently, so
    the result would silently drift with the partition layout
    (code-review r13).

    The local pass is ONE ``mapInArrow`` sweep over the range-sorted
    partitions (r15): the old ``Window.partitionBy(__pid)`` form made
    Catalyst — which cannot know spark_partition_id() is trivially
    clustered by itself — insert a SECOND full-data
    ``hashpartitioning(__pid)`` Exchange plus a full re-Sort above the
    range shuffle, the same defect the position kernel shed. A running
    sum is inherently sequential per partition, so no id trick applies;
    instead the partition's batches flow once through Arrow where the
    exclusive prefix sum is a vectorized checked cumulative_sum with a
    scalar carry across batches — zero extra data movement, at the cost
    of one JVM->Arrow->JVM round trip of exactly ``df``'s columns
    (callers should project to the needed columns first, as
    sequence_pack does). Overflow stays loud: the checked kernels raise
    where the JVM sum would have raised under ANSI."""
    _check_columns(df, cumsum_col, "with_global_cumsum")
    vtype = df.schema[value_col].dataType.typeName()
    if vtype not in _INTEGRAL_TYPES:
        raise ValueError(
            f"with_global_cumsum: value_col {value_col!r} has type "
            f"{vtype}; the exact two-phase sum requires an integral "
            "column (quantize to micro-units first)"
        )
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(
        *order_exprs
    )
    out_schema = StructType(
        list(ranged.schema.fields)
        + [
            StructField("__pid", IntegerType(), nullable=False),
            StructField("__lcum", LongType(), nullable=False),
        ]
    )

    v_idx = ranged.columns.index(value_col)

    def _local_cumsum(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        pid = pa.scalar(TaskContext.get().partitionId(), pa.int32())
        carry = pa.scalar(0, pa.int64())
        out_fields = None
        for batch in batches:
            if out_fields is None:
                # Pass-through columns keep the exact Arrow types Spark
                # handed us; only the two appended fields are new.
                out_fields = pa.schema(
                    list(batch.schema)
                    + [
                        pa.field("__pid", pa.int32(), nullable=False),
                        pa.field("__lcum", pa.int64(), nullable=False),
                    ]
                )
            v = pc.fill_null(batch.column(v_idx).cast(pa.int64()), 0)
            incl = pc.cumulative_sum_checked(v)
            excl = pc.add_checked(pc.subtract_checked(incl, v), carry)
            total = pc.sum(v)
            if total.as_py() is not None:
                carry = pc.add_checked(carry, total)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns)
                + [pa.repeat(pid, batch.num_rows), excl],
                schema=out_fields,
            )

    local = _pin_partitions(ranged.mapInArrow(_local_cumsum, out_schema))
    totals = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    # bounded-global-window: #partitions-row offsets table
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(totals), "__pid")
        .withColumn(
            cumsum_col, (F.col("__offset") + F.col("__lcum")).cast("long")
        )
        .drop("__pid", "__lcum", "__offset")
    )
