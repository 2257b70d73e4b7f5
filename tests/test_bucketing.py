"""Co-located bucketed joins (100 TB posture): two tables bucketed on the
join key join WITHOUT any Exchange — the plan-level proof that the
engine's repeated fact-to-fact joins need not shuffle."""

from __future__ import annotations

import contextlib
import io as _io
import re

import pytest
from pyspark.sql import functions as F

from eprints_to_hyku_data_tool_spark.sources import io as eio
from eprints_to_hyku_data_tool_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the exchange comparison is meaningful at fixture size."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, sf_dir, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    orders = load_table(spark, sf_dir, "orders")
    eio.write_bucketed_table(li, "b_lineitem", "l_orderkey", 8, "l_orderkey")
    eio.write_bucketed_table(orders, "b_orders", "o_orderkey", 8, "o_orderkey")
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = _plan(joined)
        assert _exchanges(plan) == 0, plan
        assert joined.count() > 0

        # control: the same join over plain parquet shuffles both sides
        plain = load_table(spark, sf_dir, "lineitem").limit(5000)
        plain_joined = plain.join(
            orders, plain.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "o_totalprice", "l_quantity")
        # >= 2: both join sides shuffle (limit() contributes one more)
        assert _exchanges(_plan(plain_joined)) >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
