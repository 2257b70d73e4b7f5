"""Scale-safe global ordering (SURVEY §2.6).

A bare ``Window.orderBy(...)`` with no partition key funnels the whole
dataset through ONE task — the classic global-row_number bottleneck. For
unique sort keys the total order is unique, so positions can be computed
distributed:

1. range-partition + sort locally on the full key (one shuffle, the same
   one a global sort needs anyway);
2. local ranks per physical partition (window keyed by partition id — the
   data is already colocated, rows of one pid stay together);
3. per-partition row counts -> cumulative offsets (one tiny aggregate,
   #partitions rows) broadcast-joined back;
4. position = offset + local rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_position(
    df: DataFrame, order_exprs: list[Column], position_col: str = "position"
) -> DataFrame:
    """Add a 1-based global position under a total order.

    The order keys must be unique in combination (add a tie-break id) —
    uniqueness is what makes the total order, and hence the positions,
    well-defined regardless of where range boundaries fall.
    """
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(
        *order_exprs
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(*order_exprs)
    local = with_pid.withColumn("__rank", F.row_number().over(w_local))
    counts = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(counts), "__pid")
        .withColumn(
            position_col, (F.col("__offset") + F.col("__rank")).cast("int")
        )
        .drop("__pid", "__rank", "__offset")
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

    ``value_col`` must be integral — the per-partition offsets are summed
    as longs, which keeps the result exact and order-independent.
    """
    ranged = df.repartitionByRange(*order_exprs).sortWithinPartitions(
        *order_exprs
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = with_pid.withColumn(
        "__lcum",
        F.coalesce(F.sum(value_col).over(w_local), F.lit(0)).cast("long"),
    )
    totals = (
        local.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
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
