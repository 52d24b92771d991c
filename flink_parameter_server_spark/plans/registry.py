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
#
# HEADROOM protocol (the registry sits at exactly 50/50 — any new
# @register raises at import):
#
# 1. MERGE, don't append. Pick the discriminated entry whose family the
#    new operator belongs to and add it as a new discriminator value in
#    BOTH fn and oracle. Established homes: new dedup/similarity method ->
#    `dedup_near_dup_pairs` (`method` column); new sketch ->
#    `ams_sketches` or `sketch_point_queries` (`sketch`); new ANN variant
#    -> `embedding_ann_topk` (`method`); new text/quality/PII signal ->
#    `text_profile` (new column, keep names oracle-aligned); new PA
#    variant -> `pa_step_weights` (`variant`); new multi-epoch trainer ->
#    `ps_train_epochs` (`family`, rows-only + equivalence test); new
#    streaming sessionization/sink -> `streaming_sessions` /
#    `streaming_agg_sinks` (`impl`/`sink`); new format ->
#    `source_format_roundtrip` (`fmt`).
# 2. REMOVING an entry to free a slot needs: (a) its operators re-homed
#    into another entry per rule 1 with CORRECTNESS still green for the
#    merged entry, (b) bench series continuity noted in BASELINE.md
#    (medians are compared round-over-round by entry name), (c) the
#    SURVEY.md §2 row updated to point at the new home. Never drop an
#    operator family from driver coverage to make room.
# 3. Column-name discipline on merge: the driver sorts columns by name
#    and hashes values, so the Spark fn and the oracle SQL must alias
#    every column identically (including the new discriminator value).
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
