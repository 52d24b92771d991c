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
    "pivot_unpivot",
    oracle=f"""
SELECT 'pivot' AS part, o_orderstatus AS k, CAST(NULL AS BIGINT) AS okey,
       CAST(NULL AS INT) AS line, CAST(NULL AS VARCHAR) AS metric,
       CAST(NULL AS DOUBLE) AS value,
       {", ".join(f'''{money_sum_sql(f"CASE WHEN o_orderpriority = '{v}' THEN o_totalprice END")} AS {a}'''
                  for v, a in PRIORITIES)}
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'unpivot' AS part, CAST(NULL AS VARCHAR) AS k, l_orderkey AS okey,
       l_linenumber AS line, metric, value,
       {", ".join(f"CAST(NULL AS DOUBLE) AS {a}" for _, a in PRIORITIES)}
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
) WHERE l_orderkey % 50 = 0
""",
    tags=("D9", "D11", "D14"),
    doc="Reshaping both ways in one query discriminated by `part` "
    "(consolidated from orders_pivot / lineitem_unpivot). 'pivot': "
    "order revenue cross-tabbed status x priority via groupBy().pivot() "
    "with an explicit value list (single shuffle, map-side partial agg "
    "per pivot bucket — no second distinct pass); the oracle is the "
    "conditional-aggregation expansion, exactly the physical form Spark "
    "lowers pivot to. 'unpivot': wide measure columns -> long (metric, "
    "value) rows via DataFrame.unpivot — a narrow map-only Expand, no "
    "shuffle, ONE scan where the oracle's UNION ALL reads the table "
    "four times; values pass through unmodified so doubles hash "
    "bit-identically.",
)
def pivot_unpivot(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in PRIORITIES])
        .agg(money_sum(F.col("o_totalprice")))
        .select(
            F.lit("pivot").alias("part"),
            F.col("o_orderstatus").alias("k"),
            F.lit(None).cast("long").alias("okey"),
            F.lit(None).cast("int").alias("line"),
            F.lit(None).cast("string").alias("metric"),
            F.lit(None).cast("double").alias("value"),
            *[F.col(f"`{v}`").alias(a) for v, a in PRIORITIES],
        )
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    unp = (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "value",
        )
        .withColumn("metric", F.regexp_replace("metric", "^l_", ""))
        .select(
            F.lit("unpivot").alias("part"),
            F.lit(None).cast("string").alias("k"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("line"),
            "metric",
            "value",
            *[F.lit(None).cast("double").alias(a) for _, a in PRIORITIES],
        )
    )
    return piv.unionByName(unp)


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
