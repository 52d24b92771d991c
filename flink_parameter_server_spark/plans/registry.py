"""Registry of (query, oracle) pairs — the driver-facing surface.

Every operator from SURVEY.md §2 that is implemented registers here:
``fn(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent DuckDB SQL. The driver hashes both results order-insensitively
with columns sorted by name, so fn and oracle must agree on column names
and on float rounding (FIXTURES.md determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query implementation with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
