"""Test-side mirror of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive value hash, plus a
type-level check (the driver's value hash is type-sensitive — an
uncast DuckDB HUGEINT sum hashes differently from Spark's bigint
even when every value matches, see VERDICT r1)."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import types as T

_DUCK_INT_WIDTH = {
    "TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64, "HUGEINT": 128,
    "UTINYINT": 8, "USMALLINT": 16, "UINTEGER": 32, "UBIGINT": 64,
}


def _spark_kind(dt):
    if isinstance(dt, T.ByteType):
        return ("int", 8)
    if isinstance(dt, T.ShortType):
        return ("int", 16)
    if isinstance(dt, T.IntegerType):
        return ("int", 32)
    if isinstance(dt, T.LongType):
        return ("int", 64)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return ("float",)
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return ("array", _spark_kind(dt.elementType))
    return ("other",)


def _duck_kind(ts):
    ts = str(ts).upper().strip()
    if ts.endswith("[]"):
        return ("array", _duck_kind(ts[:-2]))
    if ts in _DUCK_INT_WIDTH:
        return ("int", _DUCK_INT_WIDTH[ts])
    if ts in ("DOUBLE", "FLOAT", "REAL"):
        return ("float",)
    m = re.match(r"DECIMAL\((\d+),\s*(\d+)\)", ts)
    if m:
        return ("decimal", int(m.group(1)), int(m.group(2)))
    return ("other",)


def _type_mismatches(spark_schema, duck_names, duck_types):
    """Column-name-matched numeric type comparison; returns mismatch strings."""
    s_kinds = {f.name.lower(): _spark_kind(f.dataType) for f in spark_schema.fields}
    bad = []
    for name, dtype in zip(duck_names, duck_types):
        sk = s_kinds.get(name.lower())
        dk = _duck_kind(dtype)
        if sk is None:
            continue
        # unwrap matching array nesting
        while sk[0] == "array" and dk[0] == "array":
            sk, dk = sk[1], dk[1]
        if "other" in (sk[0], dk[0]):
            continue  # strings/dates/structs: the stringifying hash suffices
        if sk[0] != dk[0]:
            bad.append(f"{name}: spark {sk} vs duck {dk} ({dtype})")
        elif sk[0] == "int" and max(sk[1], dk[1]) > 64:
            # driver hash treats all <=64-bit ints alike (r01 evidence:
            # int32 rk vs BIGINT passed) but HUGEINT (int128) diverges
            bad.append(f"{name}: int width spark {sk[1]} vs duck {dk[1]} ({dtype})")
        elif sk[0] == "decimal" and sk[1:] != dk[1:]:
            bad.append(f"{name}: decimal spark {sk[1:]} vs duck {dk[1:]} ({dtype})")
    return bad


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
    duck_rel = duck_con.sql(oracle_sql)
    d_cols = [c.lower() for c in duck_rel.columns]
    d_types = duck_rel.types
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    type_bad = _type_mismatches(spark_df.schema, d_cols, d_types)
    if type_bad:
        return False, "type mismatch (driver hash would differ): " + "; ".join(type_bad)
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    ms, md = _multiset(s_rows, s_cols), _multiset(d_rows, d_cols)
    if ms != md:
        only_s = list((ms - md).items())[:3]
        only_d = list((md - ms).items())[:3]
        return False, f"value mismatch: only_spark={only_s} only_duck={only_d}"
    return True, f"ok ({len(s_rows)} rows)"
