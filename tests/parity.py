"""Order-insensitive value comparison between a Spark DataFrame and a DuckDB
oracle result — a strict local mirror of the driver's correctness check
(row count + column names + canonical value comparison).

Floats are compared via shortest round-trip repr, i.e. bit-exact: queries are
required to produce deterministic doubles (decimal-exact aggregation, IEEE
row-level arithmetic), not "close enough" ones.

Canonical tokens are TYPED and collision-free (code-review r13): strings
canonicalize via repr with an `s:` tag, bytes via a `b:` tag, so a VARCHAR
'NULL' can never compare equal to SQL NULL, '5' to 5, or 'a|b','c' to
'a','b|c' through the row join. Values are extracted from Spark via
``collect()`` and from DuckDB via the Arrow table's ``to_pylist()`` — NOT
through pandas — because both pandas paths fold SQL NULL into NaN for float
columns and degrade nullable BIGINT to float64 (collapsing integers above
2^53), which would hide genuine engine divergence.
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
        if v.tzinfo is not None:
            # One engine may surface an instant tz-aware (+00:00) and the
            # other naive-UTC — same instant, one canonical form.
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        # pd.NaT subclasses datetime — a null surfaced as NaT by one engine
        # must canonicalize like a None from the other.
        if pd.isna(v):
            return "NULL"
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, str):
        # repr-quoted + tagged: injective, and any separator characters a
        # string carries stay inside the quotes, so nested joins below and
        # the row join in canon_frame cannot be confused by cell content.
        return "s:" + repr(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{canon_value(k)}:{canon_value(x)}"
                for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
            )
            + "}"
        )
    # Loud, not str(v): an untagged fallback token can collide with every
    # other type's representation (the false-green class).
    raise AssertionError(f"canon_value: unhandled type {type(v)!r}: {v!r}")


def canon_frame(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False, name=None):
        rows.append("|".join(canon_value(v) for v in row))
    rows.sort()
    return rows


def _canon_rows(cols: list[str], row_iter) -> list[str]:
    rows = ["|".join(canon_value(v) for v in row) for row in row_iter]
    rows.sort()
    return rows


def assert_parity(spark_df, oracle_sql: str, duck_con, name: str = "") -> None:
    # Driver-canon probe (r3 q73 lesson): the driver lexsorts the raw pandas
    # frame over all columns before hashing — any cell pandas can't factorize
    # (ndarray, dict) must fail HERE, locally, not in a driver round.
    sdf = spark_df.toPandas()
    try:
        sdf.sort_values(by=sorted(sdf.columns))
    except TypeError as exc:
        raise AssertionError(
            f"{name}: output not driver-canonicalizable (pandas sort_values "
            f"failed: {exc}) — serialize complex columns before returning"
        ) from None

    # Value extraction bypasses pandas on BOTH sides: Spark rows via
    # collect() (None vs NaN distinct, BIGINT exact), DuckDB via the Arrow
    # table's to_pylist() (ditto; DATE stays date, DECIMAL stays Decimal).
    scols = sorted(spark_df.columns)
    srows_raw = [[r[c] for c in scols] for r in spark_df.collect()]
    otable = duck_con.execute(oracle_sql).fetch_arrow_table()
    ocols = sorted(otable.column_names)
    assert scols == ocols, (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    assert len(srows_raw) == otable.num_rows, (
        f"{name}: row count spark={len(srows_raw)} oracle={otable.num_rows}"
    )
    opylists = [otable.column(c).to_pylist() for c in ocols]
    srows = _canon_rows(scols, srows_raw)
    orows = _canon_rows(ocols, zip(*opylists) if opylists else iter(()))
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
