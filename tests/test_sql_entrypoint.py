"""SURVEY §3 entry point 2: the engine's operators are equally reachable
as SQL strings over registered temp views — spark.sql results must equal
the DataFrame-API results."""

from __future__ import annotations

from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all
from eprints_to_hyku_data_tool_spark.sources.tables import register_views

_load_all()


def _rows(df):
    return sorted(map(tuple, ((str(v) for v in r) for r in df.collect())))


def test_sql_equals_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    cases = {
        # join + agg (Q09 shape)
        "q909_broadcast_join": """
            SELECT r_name, n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        # window (Q31 shape)
        "z10631_keepfirst_dedupe": """
            SELECT user_id, event_type, event_id, ts
            FROM (SELECT user_id, event_type, event_id, ts,
                         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        # set op (Q42 shape)
        "z10642_except": """
            SELECT c_custkey FROM customer
            EXCEPT
            SELECT o_custkey AS c_custkey FROM orders
        """,
    }
    for name, sql in cases.items():
        api = _rows(REGISTRY[name].fn(spark, sf_dir))
        via_sql = _rows(spark.sql(sql))
        assert api == via_sql, f"{name}: SQL entry point diverges from API"
