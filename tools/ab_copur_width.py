#!/usr/bin/env python
"""Interleaved A/B: pin the baskets frame to cluster width before the
quadratic per-basket pair explode in copurchase_recommend_top5
(AQE parallelismFirst coalesces the ~150k-row basket shuffle to 3-4
x 1MB partitions, so the sum(basket^2) map ran on 4 of 32 cores)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_parameter_server_spark.session import get_spark
from flink_parameter_server_spark.operators._util import t
from flink_parameter_server_spark.operators.recommend import CAND_M, TOP_K
from flink_parameter_server_spark.scratch import release, scratch

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def entry(spark, widen):
    li = t(spark, SF, "lineitem")
    orders = t(spark, SF, "orders")
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    if widen:
        baskets = baskets.repartition(spark.sparkContext.defaultParallelism)
    cooc_full = (
        baskets.select(F.explode("items").alias("item"), "items")
        .select("item", F.explode("items").alias("rec"))
        .where(F.col("item") != F.col("rec"))
        .groupBy("item", "rec")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wp = Window.partitionBy("item").orderBy(F.col("w").desc(), F.col("rec"))
    cooc = cooc_full.withColumn("prn", F.row_number().over(wp)).where(F.col("prn") <= CAND_M).drop("prn")
    cust_items = scratch(
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    already = cust_items.select("custkey", F.col("item").alias("rec"))
    streamed = cust_items.repartition(
        cust_items.sparkSession.sparkContext.defaultParallelism, "custkey"
    )
    pre = streamed.join(F.broadcast(cooc), "item").join(
        F.broadcast(already), ["custkey", "rec"], "left_anti"
    )
    scores = pre.groupBy("custkey", "rec").agg(F.sum("w").alias("score"))
    w = Window.partitionBy("custkey").orderBy(F.col("score").desc(), F.col("rec"))
    return scores.select("custkey", "rec", "score", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= TOP_K
    )


def main():
    spark = get_spark("fps-ab-copur-width")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    a = entry(spark, False).orderBy("custkey", "rk").collect()
    release()
    b = entry(spark, True).orderBy("custkey", "rk").collect()
    release()
    assert a == b, "VALUES DIFFER"
    print("values identical:", len(a), "rows", flush=True)
    for _ in range(1):
        release(); entry(spark, False).count()
        release(); entry(spark, True).count()
    for rep in range(4):
        for name, widen in (("narrow", False), ("widened", True)):
            release()
            spark.sparkContext.setJobDescription(f"copur {name} rep{rep}")
            t0 = time.time()
            entry(spark, widen).count()
            print(f"copurchase {name:<8s} rep{rep}: {time.time()-t0:5.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
