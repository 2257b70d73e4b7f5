"""Order-insensitive value comparison between a Spark DataFrame and a DuckDB
oracle result — a strict local mirror of the driver's correctness check
(row count + column names + canonical value comparison).

Floats are compared via shortest round-trip repr, i.e. bit-exact: queries are
required to produce deterministic doubles (decimal-exact aggregation, IEEE
row-level arithmetic), not "close enough" ones.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            return "0.0"  # fold -0.0
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        # Exact, not via float: above 2^53 two different decimals would
        # otherwise canonicalize identically. Trailing zeros are stripped so
        # Decimal('1.10') == Decimal('1.1') canonicalize the same.
        d = v.normalize()
        return format(d, "f")
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        # pd.NaT subclasses datetime — a null surfaced as NaT by one engine
        # must canonicalize like a None from the other.
        if pd.isna(v):
            return "NULL"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False, name=None):
        rows.append("|".join(canon_value(v) for v in row))
    rows.sort()
    return rows


def assert_parity(spark_df, oracle_sql: str, duck_con, name: str = "") -> None:
    sdf = spark_df.toPandas()
    # Driver-canon probe (r3 q73 lesson): the driver lexsorts the raw pandas
    # frame over all columns before hashing — any cell pandas can't factorize
    # (ndarray, dict) must fail HERE, locally, not in a driver round.
    try:
        sdf.sort_values(by=sorted(sdf.columns))
    except TypeError as exc:
        raise AssertionError(
            f"{name}: output not driver-canonicalizable (pandas sort_values "
            f"failed: {exc}) — serialize complex columns before returning"
        ) from None
    # Arrow fetch preserves DATE as date32 -> datetime.date (fetchdf would
    # widen it to datetime64 and spuriously mismatch Spark's DateType).
    odf = duck_con.execute(oracle_sql).fetch_arrow_table().to_pandas()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    srows, orows = canon_frame(sdf), canon_frame(odf)
    if srows != orows:
        diffs = [
            f"  spark: {s}\n  oracle:{o}"
            for s, o in zip(srows, orows)
            if s != o
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch ({sum(1 for s, o in zip(srows, orows) if s != o)}"
            f" of {len(srows)} rows differ):\n" + "\n".join(diffs)
        )
