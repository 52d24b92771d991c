"""Deterministic, oracle-reproducible hashing primitives.

The reference seeds its randomness from Scala RNGs
(`matrix/factorization/utils/RangedRandomFactorInitializerDescriptor`
[C-med]) — not reproducible cross-engine. Per FIXTURES.md's determinism
rules we replace every random draw with explicit integer arithmetic that
both Spark and DuckDB evaluate bit-identically:

- ``poly_hash``    — left-fold polynomial hash over a string's character
                     codes, mod a prime. Used for token minhash, bloom bit
                     positions, AMS signs, simhash.
- ``int_hash``     — Knuth multiplicative hash of (id, j, seed) mod the
                     same prime. Used for factor init, sampling, signs.

Each primitive has a ``*_sql`` twin that renders the identical DuckDB SQL
expression; all exact int64 arithmetic, no overflow (operands stay far
below 2^63), identical fold order, so results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime modulus; small enough that acc*31 + 127 < 2^25 (no overflow),
# large enough for minhash / bloom bit-position quality at our scales.
MOD = 1_000_003
# Knuth's multiplicative constant (2654435761 = 2^32 * golden ratio).
KNUTH = 2_654_435_761


# --------------------------------------------------------------------------
# polynomial string hash
# --------------------------------------------------------------------------

def poly_hash(col: Column, seed: int) -> Column:
    """h = fold over chars: acc -> (acc*31 + codepoint) % MOD, acc0 = seed."""
    codes = F.transform(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        lambda c: F.ascii(c).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(seed).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(MOD),
    )


def poly_hash_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`poly_hash` (identical fold order + arithmetic).

    The CASE guard keeps null-in-null-out parity with Spark: on a NULL
    input DuckDB's ``list_prepend(seed, NULL)`` yields ``[seed]`` so the
    bare fold would return the seed, while Spark's ``aggregate`` over a
    NULL array returns NULL (found by the r6 null-injection sweep).

    CAVEAT (ADVICE r6): ``{expr}`` is interpolated TWICE (once in the
    CASE guard, once in the fold), so a parameterized caller must
    double its ``?`` placeholders, and an expensive ``expr`` is
    evaluated twice unless the engine CSEs it. Callers that care should
    pre-project the expression under an alias in a CTE and pass the
    alias here (the repo's oracle SQL does exactly that via the
    MATERIALIZED th/sh CTEs)."""
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST({seed} AS BIGINT), "
        f"list_transform(list_filter(string_split({expr}, ''), c -> c <> ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {MOD}) END"
    )


# NOTE (r3, VERDICT task #6 measurement): a flat closed-form expansion of
# poly_hash for short tokens (h = (seed*31^L + sum_i code_i*31^(L-i)) %
# MOD with pre-reduced power literals — verified bit-identical to the
# fold in both engines) was prototyped and benchmarked, and REJECTED:
# every hot token-hash site lives inside a higher-order-function lambda
# (transform over the token array), where Spark evaluates expressions
# interpreted, not in whole-stage codegen — there the 16-term flat
# expression is ~2x SLOWER than the short fold (8.7s vs 4.7s for the
# shingle stage at sf0.1). The winning optimization is structural:
# hash once per DISTINCT token and join back (operators/dedup.py
# token_hash_arrays), which removes the work instead of restating it.


# --------------------------------------------------------------------------
# integer hash (ids, (id, dim) pairs, sampling decisions)
# --------------------------------------------------------------------------

def int_hash(col: Column, j: int = 0, seed: int = 0) -> Column:
    """h = ((id+1)*KNUTH + (j+1)*40503 + seed*97) % MOD  — all int64-exact."""
    return (
        ((col.cast("long") + F.lit(1)) * F.lit(KNUTH) + F.lit((j + 1) * 40503 + seed * 97))
        % F.lit(MOD)
    )


def int_hash_sql(expr: str, j: int = 0, seed: int = 0) -> str:
    return (
        f"((CAST({expr} AS BIGINT) + 1) * {KNUTH} + {(j + 1) * 40503 + seed * 97}) % {MOD}"
    )


def int_hash2(a: Column, b: Column, seed: int = 0) -> Column:
    """Pair hash for (user,item)-style sampling decisions; int64-exact.

    (a+1)*KNUTH + (b+1)*40503 + seed*97, mod MOD. a,b must be < ~2^31.
    """
    return (
        ((a.cast("long") + F.lit(1)) * F.lit(KNUTH)
         + (b.cast("long") + F.lit(1)) * F.lit(40503)
         + F.lit(seed * 97))
        % F.lit(MOD)
    )


def int_hash2_sql(a: str, b: str, seed: int = 0) -> str:
    return (
        f"((CAST({a} AS BIGINT) + 1) * {KNUTH} + (CAST({b} AS BIGINT) + 1) * 40503 "
        f"+ {seed * 97}) % {MOD}"
    )


def unit_uniform(h: Column) -> Column:
    """Map a hash in [0, MOD) to a double in [0, 1) — same op both engines."""
    return h.cast("double") / F.lit(float(MOD))


def unit_uniform_sql(h_expr: str) -> str:
    return f"(CAST({h_expr} AS DOUBLE) / {float(MOD)})"
