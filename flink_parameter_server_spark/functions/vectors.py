"""Dense-vector column math over ``array<double>`` columns.

Reference analog: breeze ``DenseVector``/``SparseVector`` ops inside the
SGD updater and PA algorithms (`matrix/factorization/utils/SGDUpdater`,
`passive/aggressive/algorithm/*` [C-med/high]). Here vectors are plain
SQL arrays and every op is a built-in higher-order function — JVM-side,
codegen-friendly, no UDF. The DuckDB twins fold in the identical order so
float64 results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Cast array<float> -> array<double> (do this before any arithmetic)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (same order as the SQL twin)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), "
        f"s -> CAST(struct_extract(s, 1) AS DOUBLE) * CAST(struct_extract(s, 2) AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def dot_fixed(a: Column, b: Column, k: int) -> Column:
    """Dot product statically expanded for a known dimension k.

    Bitwise-identical to :func:`dot` (left-associated addition, and
    0.0 + p0 == p0 exactly), but a flat scalar expression that stays in
    whole-stage codegen — use on hot pair loops where the interpreted
    higher-order-function fold of :func:`dot` costs too much.
    """
    terms = [F.element_at(a, j + 1) * F.element_at(b, j + 1) for j in range(k)]
    out = terms[0]
    for term in terms[1:]:
        out = out + term
    return out


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance — left-fold sum of squared differences, the
    same sequential order as :func:`l2sq_sql` so float64 results match
    bit-for-bit across engines (the dot/norm2 determinism contract)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), "
        f"s -> (CAST(struct_extract(s, 1) AS DOUBLE) - CAST(struct_extract(s, 2) AS DOUBLE))"
        f" * (CAST(struct_extract(s, 1) AS DOUBLE) - CAST(struct_extract(s, 2) AS DOUBLE)))), "
        f"(acc, x) -> acc + x)"
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm."""
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def norm2_sql(a: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({norm2_sql(a)}) * sqrt({norm2_sql(b)})))"
