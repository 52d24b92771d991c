#!/usr/bin/env python
"""Interleaved A/B for the bidir trainer's epoch fold (VERDICT r15 #5):

A = r15 baseline train_bidirectional
B = preseeded params: ONE persisted (param_id, init value) table over
    the ids the ratings touch replaces the per-pull distinct+init build
    (the mf ufac scratch-persist precedent moved into the server state)
C = B + ratings pre-keyed: the per-epoch item-side pull input is
    repartitioned by param_id ONCE and cached, so every epoch's pull
    join reuses the exchange (guide 2.4)

Each variant returns the model value hash so equivalence is checked in
the same run. Usage: SPARK_GRAFT_CPUS=32 python tools/ab_r16_bidir.py [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from flink_parameter_server_spark.functions import vectors
    from flink_parameter_server_spark.ps import mf
    from flink_parameter_server_spark.ps.kernel import BatchParameterServer
    from flink_parameter_server_spark.scratch import release, scratch
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-ab-bidir")
    spark.sparkContext.setLogLevel("ERROR")
    K, LR = mf.K, mf.LR

    def bidir(r, preseed=False, keyed=False, epochs=2):
        init_fn = lambda pid: F.when(  # noqa: E731
            pid % 2 == F.lit(0), mf.user_vec(F.floor(pid / 2))
        ).otherwise(mf.item_vec(F.floor(pid / 2)))
        params = None
        if preseed:
            ids = (
                r.select((F.col("item") * 2 + 1).alias("param_id"))
                .unionByName(r.select((F.col("user") * 2).alias("param_id")))
                .distinct()
            )
            params = scratch(ids.withColumn("value", init_fn(F.col("param_id"))))
        ps = BatchParameterServer(k=K, checkpoint_every=1, init_fn=init_fn, params=params)
        ritems = r.select((F.col("item") * 2 + 1).alias("param_id"), "user", "item", "rating")
        if keyed:
            ritems = scratch(
                ritems.repartition(
                    spark.sparkContext.defaultParallelism, F.col("param_id")
                )
            )
        for _ in range(epochs):
            pulled_items = ps.pull(ritems).withColumnRenamed("value", "ivec").drop("param_id")
            both = (
                ps.pull(
                    pulled_items.select(
                        (F.col("user") * 2).alias("param_id"), "user", "item", "rating", "ivec"
                    )
                )
                .withColumnRenamed("value", "uvec")
                .drop("param_id")
            )
            both = scratch(
                both.withColumn(
                    "e", F.col("rating") - vectors.dot_fixed(F.col("uvec"), F.col("ivec"), K)
                )
            )
            item_deltas = both.select(
                (F.col("item") * 2 + 1).alias("param_id"),
                F.transform(F.col("uvec"), lambda u_j: F.lit(LR) * F.col("e") * u_j).alias("delta"),
            )
            user_deltas = both.select(
                (F.col("user") * 2).alias("param_id"),
                F.transform(F.col("ivec"), lambda i_j: F.lit(LR) * F.col("e") * i_j).alias("delta"),
            )
            ps.push(item_deltas.unionByName(user_deltas))
        return ps.params.select(
            F.when(F.col("param_id") % 2 == 0, F.lit("user")).otherwise(F.lit("item")).alias("side"),
            F.floor(F.col("param_id") / 2).cast("long").alias("id"),
            F.posexplode("value").alias("dim", "v"),
        ).select("side", "id", "dim", F.round("v", 6).alias("v"))

    def sig(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("side", "id", "dim", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    variants = [
        ("A_base", dict(preseed=False, keyed=False)),
        ("B_seed", dict(preseed=True, keyed=False)),
        ("C_seed+key", dict(preseed=True, keyed=True)),
    ]
    sigs = set()
    for i in range(pairs):
        for label, kw in variants:
            release()
            rat = scratch(mf.ratings(spark, SF))
            rat.count()
            spark.sparkContext.setJobDescription(f"bidir {label} rep{i}")
            t0 = time.time()
            s = sig(bidir(rat, **kw))
            dt = time.time() - t0
            sigs.add(s)
            print(f"{label:12s} rep{i}: {dt:6.2f}s  n={s[0]} h={s[1]}", flush=True)
    print(f"signatures identical: {len(sigs) == 1}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
