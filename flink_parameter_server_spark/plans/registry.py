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
from functools import wraps

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

# The driver verifies at most this many registry entries per round; a 51st
# registration would silently fall outside driver coverage (the exact hole
# round 2 hit with 82 entries). Adding an operator therefore means MERGING
# it into an existing discriminated entry (see SURVEY.md §2's consolidation
# mapping), not appending entry #51.
MAX_ENTRIES = 50


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query implementation with its oracle SQL.

    The registered fn releases the PREVIOUS query's tracked scratch
    storage (persisted intermediates, surviving checkpoint rounds) on
    entry — see scratch.py for the lifecycle contract. The module-level
    symbol stays unwrapped so intra-module composition does not release
    an enclosing query's own scratch mid-build.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if len(REGISTRY) >= MAX_ENTRIES:
            raise ValueError(
                f"registry cap exceeded: {name!r} would be entry "
                f"#{len(REGISTRY) + 1} > MAX_ENTRIES={MAX_ENTRIES} (the driver "
                f"verifies at most {MAX_ENTRIES} entries — merge the new "
                "operator into an existing discriminated entry instead)"
            )

        @wraps(fn)
        def released(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..scratch import release

            release()
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name, fn=released, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco
