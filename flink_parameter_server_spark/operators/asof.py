"""As-of (nearest-prior) join — SURVEY.md §2 D8.

No reference analog (the reference joins nothing by time); this is the
canonical time-series/training-data operator the north star requires.

Implementation is the scalable union-sort form, NOT a row-multiplying
theta join: tag both sides, union, then one window pass per key ordered
by time carrying the last right-side row forward. Cost = one shuffle on
the key + an in-partition sort — linear, skew-bounded, no O(n*m) pair
blowup, so it survives 100 TB where `JOIN ... ON r.ts <= l.ts` +
row_number would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..scratch import scratch
from ._util import t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts for the same `on` key (inclusive, like DuckDB
    ASOF JOIN). Right-side payload columns come back prefixed `asof_`.
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast("struct<ts:long," + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload) + ">")
    )
    r = right.select(
        F.col(right_ts).alias(left_ts),
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(F.unix_micros(right_ts).alias("ts"), *[F.col(c) for c in right_payload]).alias("__payload"),
    )
    for c in lcols:
        if c not in (on, left_ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(*lcols, "__side", "__payload").unionByName(r.select(*lcols, "__side", "__payload"))
    # right rows sort before left rows at equal ts => inclusive (<=) match;
    # __payload as the final sort key makes the pick deterministic when
    # several right rows share the same (key, ts) — struct compare falls
    # through ts to the payload columns, so F.last always grabs the same row.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts), F.col("__side"), F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance_us is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.unix_micros(F.col(left_ts)) - F.col("__match.ts") <= F.lit(tolerance_us),
                F.col("__match"),
            ),
        )
    out = matched.select(
        *lcols, *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_payload], F.col("__match.ts").alias("asof_ts_us")
    )
    return out


TOLERANCE_US = 10 * 60 * 1_000_000  # 10 minutes


@register(
    "purchase_last_click_asof",
    oracle=f"""
SELECT 'unbounded' AS variant, p.event_id, c.event_id AS click_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
UNION ALL
SELECT 'tol_10min' AS variant, p.event_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {TOLERANCE_US} THEN c.event_id END AS click_event_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {TOLERANCE_US} THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    tags=("D8",),
    doc="For each purchase, the user's most recent prior (or "
    "simultaneous) click — both as-of variants discriminated by "
    "`variant` (r3). 'unbounded': classic nearest-prior match. "
    "'tol_10min': the tolerance form (pandas merge_asof semantics) — a "
    "match older than 10 minutes nulls out instead of attaching stale "
    "context, the form feature-engineering pipelines actually use. "
    "Oracle is DuckDB's native ASOF JOIN (+ the tolerance null-out). "
    "Both variants share the union-sort single-window plan (one shuffle "
    "on the key, no pair blowup — see asof_join).",
)
def purchase_last_click_asof(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id"), "user_id", "ts"
    )

    # ONE union-sort window pass; the tolerance variant is a pure
    # projection of the unbounded result (null out matches older than
    # the tolerance), so the expensive shuffle+sort runs once, not twice
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id"],
    ).select(
        "event_id",
        F.col("asof_event_id").alias("click_event_id"),
        (F.unix_micros("ts") - F.col("asof_ts_us")).alias("gap_us"),
    )
    joined = scratch(joined)
    unbounded = joined.select(F.lit("unbounded").alias("variant"), "*")
    in_tol = F.col("gap_us") <= TOLERANCE_US
    tol = joined.select(
        F.lit("tol_10min").alias("variant"),
        "event_id",
        F.when(in_tol, F.col("click_event_id")).alias("click_event_id"),
        F.when(in_tol, F.col("gap_us")).alias("gap_us"),
    )
    return unbounded.unionByName(tol)
