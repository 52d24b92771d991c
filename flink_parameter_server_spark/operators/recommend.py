"""Flagship recommendation query (SURVEY.md §7 M0) — item co-purchase
top-5 per customer.

This is the relational dual of what the reference's online-MF top-K job
produces (`matrix/factorization/PSOnlineMatrixFactorizationAndTopKGeneration.scala`
[C-med]): continuous per-user item recommendations. Here the signal is
order-basket co-occurrence instead of latent factors (the factor-based
scorer lives in ps/queries.py).

Scale: the pair self-join is per-order (bounded fan-out = basket size²),
co-occurrence aggregates shuffle on item ids (uniform), and the final
top-k is a window row_number — no cross join anywhere, so the plan is
linear in |lineitem| + sum(basket²) and survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..scratch import scratch
from ._util import t

TOP_K = 5
# candidate-generation cap: keep only the top-M co-occurring items per
# item before the customer join — bounds the join fan-out to |cust_items|*M
# regardless of co-occurrence density (the knob that makes this survive
# 100 TB; without it the score join is |cust_items| x avg-cooc-degree).
CAND_M = 30


@register(
    "copurchase_recommend_top5",
    oracle=f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cooc_full AS (
  SELECT a.l_partkey AS item, b.l_partkey AS rec, count(*) AS w
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
cooc AS (
  SELECT item, rec, w FROM (
    SELECT item, rec, w, row_number() OVER (PARTITION BY item ORDER BY w DESC, rec) AS prn
    FROM cooc_full
  ) WHERE prn <= {CAND_M}
),
cust_items AS (
  SELECT DISTINCT o_custkey AS custkey, l_partkey AS item
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
scores AS (
  SELECT ci.custkey, c.rec, CAST(sum(c.w) AS BIGINT) AS score
  FROM cust_items ci JOIN cooc c ON ci.item = c.item
  WHERE NOT EXISTS (SELECT 1 FROM cust_items o
                    WHERE o.custkey = ci.custkey AND o.item = c.rec)
  GROUP BY 1, 2
)
SELECT custkey, rec, score, rk FROM (
  SELECT custkey, rec, score,
         row_number() OVER (PARTITION BY custkey ORDER BY score DESC, rec) AS rk
  FROM scores
) WHERE rk <= {TOP_K}
""",
    tags=("M0", "B5"),
)
def copurchase_recommend_top5(spark, sf_dir, broadcast_dims: bool = True):
    """Top-5 new-item recommendations per customer by basket co-occurrence,
    excluding items the customer already bought.

    ``broadcast_dims=False`` is the 100 TB shape rehearsal: neither cooc
    nor the already-bought set fits a broadcast there, so the hints are
    dropped and the same program must run as co-partitioned shuffle
    joins while KEEPING the single custkey exchange that feeds both the
    aggregation and the window (pinned by tests/test_plans.py).
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")

    # Pair generation is join-free (r5, measured 3x over the basket
    # self-join): ONE shuffle collects each order's item set (bounded by
    # basket size — map-side partial collect_set), then the a!=b pairs
    # explode map-side. Work and output are both sum(basket^2), same as
    # the self-join, without re-exchanging and sort-merging the basket
    # table. At 100 TB a pathological mega-basket would make the per-key
    # set large — TPC-H-style order baskets are bounded (<=7 here), which
    # is the contract; unbounded-key pair expansion belongs to the
    # banded dedup operators instead.
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    cooc_full = (
        baskets.select(F.explode("items").alias("item"), "items")
        .select("item", F.explode("items").alias("rec"))
        .where(F.col("item") != F.col("rec"))
        .groupBy("item", "rec")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wp = Window.partitionBy("item").orderBy(F.col("w").desc(), F.col("rec"))
    cooc = (
        cooc_full.withColumn("prn", F.row_number().over(wp))
        .where(F.col("prn") <= CAND_M)
        .drop("prn")
    )
    # persisted: consumed by both the scoring join and the already-bought
    # anti join
    cust_items = scratch(
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    already = cust_items.select("custkey", F.col("item").alias("rec"))
    # Shuffle layout (r15 optimization, guide §2.3/§8: make every shuffle
    # but the last move a lightweight proxy): establish the custkey
    # partitioning BEFORE the CAND_M-fold candidate fan-out, not after.
    # The pre-join (custkey, item) set is ~30x smaller than the scored
    # candidate set (|cust_items| x CAND_M, ~16.5M rows at sf0.1), and
    # hash(custkey) satisfies the clustering requirement of BOTH the
    # groupBy(custkey, rec) and the custkey window, while the broadcast
    # joins preserve the streamed side's partitioning — so the scored
    # fan-out crosses ZERO exchanges (measured: one 550k-row exchange
    # replaces the 16.5M-row one, 5.4 -> 4.6 s at sf0.1; plan receipt in
    # plans/r15/copurchase_recommend_top5_after.txt).
    # Two deliberate details:
    # - the repartition sits ABOVE the cache read (the cached plan's
    #   output partitioning is not propagated to consumers under AQE, so
    #   repartitioning before the cache was measured useless), and moves
    #   only the narrow pre-fan-out rows;
    # - the width is pinned to defaultParallelism, NOT left to AQE
    #   coalescing: AQE sizes the exchange by its own ~10 MB output and
    #   would collapse it to 1-2 partitions, serializing the 30x fan-out
    #   ABOVE it (measured 8.0 s vs 4.6 s). The explicit width scales
    #   with the cluster, not with the pre-fan-out byte count.
    # At 100 TB neither side broadcasts: drop both hints and the same
    # program runs as co-partitioned SMJs (AQE picks them) with the
    # post-anti-join repartition feeding agg + window as before.
    maybe_broadcast = F.broadcast if broadcast_dims else (lambda df: df)
    streamed = (
        cust_items.repartition(
            cust_items.sparkSession.sparkContext.defaultParallelism, "custkey"
        )
        if broadcast_dims
        else cust_items
    )
    pre = streamed.join(maybe_broadcast(cooc), "item").join(
        maybe_broadcast(already), ["custkey", "rec"], "left_anti"
    )
    if not broadcast_dims:
        # SMJ path: the joins re-keyed the rows (item, then custkey/rec);
        # one custkey repartition of the scored set feeds agg + window
        pre = pre.repartition("custkey")
    scores = pre.groupBy("custkey", "rec").agg(F.sum("w").alias("score"))
    w = Window.partitionBy("custkey").orderBy(F.col("score").desc(), F.col("rec"))
    return scores.select("custkey", "rec", "score", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= TOP_K
    )
