"""Test-side mirror of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import math
from collections import Counter


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # stable shortest repr; queries round to 6dp so this is safe
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, duck_con, oracle_sql: str):
    """Return (ok, message). Mirrors the driver's t2 comparison."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(oracle_sql)
    d_cols = [c.lower() for c in rel.description and [d[0] for d in rel.description]]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    ms, md = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        return False, f"value mismatch: only_spark={only_s} only_duck={only_d}"
    return True, f"ok ({len(s_rows)} rows)"
