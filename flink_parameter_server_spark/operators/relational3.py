"""Relational substrate, part 3: pivot/unpivot reshaping, exact
multi-quantiles, and time-series gap filling (SURVEY.md §2 D9, D11/D12
adjacency — reshaping and ordered-analytics surface a Flink-table user
would expect from the engine; gap-fill is the hypertable-style rollup
companion for regular time grids).

All four queries are pure built-in-function DataFrame programs (no UDFs,
whole-stage codegen end to end) with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import register
from ._util import money_sum, money_sum_sql, t

# Fixed pivot domain (TPC-H order priorities): a deterministic value list
# keeps the pivot single-pass (no extra distinct-scan job) and the output
# schema stable at any scale factor.
PRIORITIES = [
    ("1-URGENT", "p_urgent"),
    ("2-HIGH", "p_high"),
    ("3-MEDIUM", "p_medium"),
    ("4-NOT SPECIFIED", "p_notspec"),
    ("5-LOW", "p_low"),
]


@register(
    "orders_pivot",
    oracle=f"""
SELECT o_orderstatus,
       {", ".join(f'''{money_sum_sql(f"CASE WHEN o_orderpriority = '{v}' THEN o_totalprice END")} AS {a}'''
                  for v, a in PRIORITIES)}
FROM orders
GROUP BY o_orderstatus
""",
    tags=("D9", "D11"),
    doc="Pivot: order revenue cross-tabbed status x priority via "
    "groupBy().pivot() with an explicit value list (single shuffle, "
    "map-side partial agg per pivot bucket — no second distinct pass). "
    "Oracle is the conditional-aggregation expansion, which is exactly "
    "the physical form Spark lowers pivot to.",
)
def orders_pivot(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in PRIORITIES])
        .agg(money_sum(F.col("o_totalprice")))
    )
    return piv.select(
        "o_orderstatus", *[F.col(f"`{v}`").alias(a) for v, a in PRIORITIES]
    )


@register(
    "lineitem_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
) WHERE l_orderkey % 50 = 0
""",
    tags=("D9", "D14"),
    doc="Unpivot/melt: wide measure columns -> long (metric, value) rows "
    "via DataFrame.unpivot — a narrow map-only Expand, no shuffle, no "
    "UNION rescan of the input (the oracle's UNION ALL form reads the "
    "table four times; unpivot reads it once). Values pass through "
    "unmodified so doubles hash bit-identically.",
)
def lineitem_unpivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    ).withColumn("metric", F.regexp_replace("metric", "^l_", ""))


@register(
    "order_value_quantiles",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 6) AS q25,
       round(quantile_cont(o_totalprice, 0.50), 6) AS q50,
       round(quantile_cont(o_totalprice, 0.75), 6) AS q75,
       round(quantile_cont(o_totalprice, 0.90), 6) AS q90,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
""",
    tags=("C4", "D9"),
    doc="Exact multi-quantile per group: Spark's exact percentile() "
    "(linear interpolation at rank (n-1)p, identical to DuckDB "
    "quantile_cont) — the oracle-checkable counterpart of the "
    "approx_percentile sketch in sketch_builtins. Single hash "
    "aggregation; at 100 TB swap percentile -> approx_percentile "
    "(t-digest merge, no sort) with the same query shape.",
)
def order_value_quantiles(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(o_totalprice, 0.90)"), 6).alias("q90"),
        F.count(F.lit(1)).alias("n"),
    )


# events_hourly_gap_fill was folded into events_multires_rollup
# (operators/windows.py, grain='hour_filled') — it re-aggregates the same
# hourly level, so one query covers both (registry consolidation, r3).
