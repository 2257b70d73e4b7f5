"""Order-insensitive value comparison between a Spark DataFrame and a DuckDB
oracle result — a strict local mirror of the driver's correctness check
(row count + column names + canonical value comparison).

Floats are compared via shortest round-trip repr, i.e. bit-exact: queries are
required to produce deterministic doubles (decimal-exact aggregation, IEEE
row-level arithmetic), not "close enough" ones.

Canonical tokens are TYPED and collision-free (code-review r13 + r14):
strings canonicalize via repr with an `s:` tag, bytes via a `b:` tag,
decimals via a `d:` tag, arrays via `a:[...]`, structs/maps via a keyed
`kv:{...}` form — so a VARCHAR 'NULL' can never compare equal to SQL NULL,
'5' to 5, a STRUCT(1,2) to an ARRAY [1,2] (the r14 container-collision
class), or 'a|b','c' to 'a','b|c' through the row join.

Extraction is SYMMETRIC through Arrow on both sides (code-review r14):
Spark via ``DataFrame.toArrow()`` and DuckDB via ``fetch_arrow_table()``,
both read out with ``to_pylist()`` — NOT through pandas — because the
pandas paths fold SQL NULL into NaN for float columns and degrade nullable
BIGINT to float64 (collapsing integers above 2^53). The Arrow path also
fixes two asymmetries the old ``collect()`` extraction had: TimestampType
rows came back through ``datetime.fromtimestamp`` (OS-LOCAL timezone — a
latent whole-suite false RED on any non-UTC machine; Arrow attaches the
session's UTC zone instead), and containers came back as positional Row
tuples vs DuckDB's keyed dicts (structs now surface as dicts and maps as
key-value tuple lists on BOTH sides). It also halves the gate's Spark
cost: the driver-canon sortability probe runs on ``to_pandas()`` of the
SAME materialized Arrow table instead of a second full execution.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter
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
        # Decimal('1.10') == Decimal('1.1') canonicalize the same. Tagged
        # (code-review r14): the untagged token collided with a double's
        # shortest repr within half an ulp ('bit-exact' gate, laxer compare)
        # and flipped to a false RED exactly when the value was integral
        # ('2' int-token vs '2.0' float-token). Oracles must CAST to the
        # type the Spark side returns — the one decimal-emitting oracle
        # (benford expected_p) now casts to DOUBLE.
        # String-form zero-strip, NOT Decimal.normalize(): normalize()
        # rounds to the ambient context precision (28 significant
        # digits by default), so two DECIMAL(38)s agreeing in their
        # first 28 digits canonicalized IDENTICALLY — a false GREEN on
        # exactly the wide decimals DuckDB's fetch_arrow_table emits
        # for SUM(BIGINT) (code-review r15, confirmed by execution).
        # format(v, 'f') is exact at any precision; stripping trailing
        # fractional zeros keeps Decimal('1.10') == Decimal('1.1').
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
        return "d:" + s
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
        # the row join in _canon_rows cannot be confused by cell content.
        return "s:" + repr(v)
    # Containers (code-review r14): each family carries its own tag so a
    # struct can never compare equal to an array of its fields (pyspark's
    # Row subclasses tuple — untagged, STRUCT(1,2) and LIST [1,2] were
    # byte-identical tokens). Structs and maps share the keyed kv-form on
    # purpose: Spark surfaces structs as Rows/dicts and maps as dicts,
    # Arrow-extracted DuckDB surfaces structs as dicts and maps as
    # key-value tuple lists — one keyed form makes equal values match
    # whichever keyed shape the engine used. (Arrow surfaces an empty map
    # as [] — indistinguishable from an empty list, so it canonicalizes
    # as a:[]; queries comparing empty maps must cast them.)
    if isinstance(v, tuple) and hasattr(v, "asDict"):  # pyspark Row
        v = v.asDict()
    if isinstance(v, dict):
        return _kv_token(v.items())
    if isinstance(v, (list, tuple, np.ndarray)):
        vals = list(v)
        if vals and all(
            isinstance(x, tuple) and not hasattr(x, "asDict") and len(x) == 2
            for x in vals
        ):
            # Arrow's to_pylist shape for MAP values: a list of plain
            # (key, value) 2-tuples. Plain tuples arise from no other
            # source (structs are dicts/Rows, lists are lists). Handled
            # as PAIRS, never via dict(vals): array-/struct-keyed maps
            # are legal in both engines and their keys are unhashable
            # Python values — dict() crashed the gate on identical
            # results (code-review r15, a false crash-RED).
            return _kv_token(vals)
        return "a:[" + ",".join(canon_value(x) for x in vals) + "]"
    # Loud, not str(v): an untagged fallback token can collide with every
    # other type's representation (the false-green class).
    raise AssertionError(f"canon_value: unhandled type {type(v)!r}: {v!r}")


def _kv_token(pairs) -> str:
    """Shared keyed form for structs and maps: both the dict shape
    (Spark) and the (key, value) tuple-list shape (Arrow-extracted
    DuckDB maps) MUST sort entries by the same key — the canonical key
    token, which is injective and total where raw Python keys need not
    even be hashable or mutually comparable."""
    entries = [(canon_value(k), canon_value(x)) for k, x in pairs]
    entries.sort()
    return "kv:{" + ",".join(f"{k}={x}" for k, x in entries) + "}"


def _canon_rows(row_iter) -> list[str]:
    rows = ["|".join(canon_value(v) for v in row) for row in row_iter]
    rows.sort()
    return rows


def assert_parity(spark_df, oracle_sql: str, duck_con, name: str = "") -> int:
    """Compare ``spark_df`` against ``oracle_sql`` run on ``duck_con``;
    raises AssertionError on any divergence, returns the row count so
    callers can reject vacuously-empty results where emptiness is not
    the query's documented answer."""
    # ONE materialization (code-review r14): the Arrow table feeds both
    # the driver-canon probe and the value comparison. The old shape ran
    # the full plan twice (toPandas probe + collect compare) — double
    # cost, and for a nondeterministic bug the probe checked a different
    # result than the one compared.
    stable = spark_df.toArrow()

    # Driver-canon probe (r3 q73 lesson): the driver lexsorts the raw
    # pandas frame over all columns before hashing — any cell pandas
    # can't factorize (ndarray, dict) must fail HERE, locally, not in a
    # driver round.
    sdf = stable.to_pandas()
    try:
        # (TypeError, ValueError): the multi-column lexsort path raises
        # TypeError on unfactorizable cells, but the SINGLE-by-column
        # path uses comparison-based nargsort and raises ValueError for
        # the very ndarray-cell case this probe names, as do duplicate
        # column labels — both escaped the old narrow except and
        # surfaced as raw pandas tracebacks (code-review r15).
        sdf.sort_values(by=sorted(sdf.columns))
    except (TypeError, ValueError) as exc:
        raise AssertionError(
            f"{name}: output not driver-canonicalizable (pandas sort_values "
            f"failed: {exc}) — serialize complex columns before returning"
        ) from None
    if len(sdf) <= 1:
        # sort_values performs ZERO comparisons on a 0/1-row frame, so
        # the probe above is vacuous there (code-review r15): a 1-row
        # result with an ndarray/dict cell passed locally and failed
        # only in a run where the result grew. Check the cells
        # explicitly at the sizes where sorting can't.
        for col in sdf.columns:
            for cell in sdf[col]:
                # list/tuple included (code-review r15, second pass):
                # Arrow surfaces MAP columns to pandas as lists of
                # (k, v) tuples, which the multi-column lexsort cannot
                # factorize at >= 2 rows — exactly the size-dependent
                # flip this explicit check exists to close.
                if isinstance(cell, (np.ndarray, dict, set, list, tuple)):
                    raise AssertionError(
                        f"{name}: output not driver-canonicalizable "
                        f"(column {col!r} holds a {type(cell).__name__} "
                        f"cell) — serialize complex columns before "
                        f"returning"
                    )

    scols = sorted(stable.column_names)
    otable = duck_con.execute(oracle_sql).fetch_arrow_table()
    ocols = sorted(otable.column_names)
    assert scols == ocols, (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    assert stable.num_rows == otable.num_rows, (
        f"{name}: row count spark={stable.num_rows} oracle={otable.num_rows}"
    )
    spylists = [stable.column(c).to_pylist() for c in scols]
    opylists = [otable.column(c).to_pylist() for c in ocols]
    srows = _canon_rows(zip(*spylists) if spylists else iter(()))
    orows = _canon_rows(zip(*opylists) if opylists else iter(()))
    if srows != orows:
        # Multiset diff, not positional zip (code-review r14): one extra
        # canon-low row used to misalign every later pair, reporting
        # hundreds of phantom diffs and sampling none of the real ones.
        sc, oc = Counter(srows), Counter(orows)
        only_s = list((sc - oc).elements())
        only_o = list((oc - sc).elements())
        sample = "\n".join(
            ["  spark-only: " + r for r in only_s[:5]]
            + ["  oracle-only:" + r for r in only_o[:5]]
        )
        raise AssertionError(
            f"{name}: value mismatch ({len(only_s)} spark-only / "
            f"{len(only_o)} oracle-only of {len(srows)} rows):\n{sample}"
        )
    return stable.num_rows
