#!/usr/bin/env python
"""Interleaved A/B (FIXTURES.md #13 audit, VERDICT r14 #5): fan_out on
the embeddings scan feeding the PA margin/explode maps.
Variants: plain pa.instances vs fan_out'd, consumed by the
pa_step_weights body (count(), bench methodology)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_parameter_server_spark.session import get_spark
from flink_parameter_server_spark.operators._util import fan_out
from flink_parameter_server_spark.ps import pa
from flink_parameter_server_spark.scratch import release, scratch

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def body(inst):
    binaries = pa.binary_steps_all_variants(inst).select(
        "variant",
        F.lit(-1).cast("long").alias("class_id"),
        "feat_id",
        F.round("w", 6).alias("w"),
    )
    multi = pa.multiclass_step(inst).select(
        F.lit("mc").alias("variant"),
        F.col("class_id").cast("long").alias("class_id"),
        F.col("feat_id").cast("long").alias("feat_id"),
        F.round("w", 6).alias("w"),
    )
    return binaries.unionByName(multi)


def main():
    spark = get_spark("fps-ab-pa-fanout")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print("embeddings scan partitions:",
          pa.instances(spark, SF).rdd.getNumPartitions(), flush=True)

    def plain():
        return body(scratch(pa.instances(spark, SF)))

    def fanned():
        return body(scratch(fan_out(pa.instances(spark, SF))))

    # value identity first
    a = plain().orderBy("variant", "class_id", "feat_id").collect()
    release()
    b = fanned().orderBy("variant", "class_id", "feat_id").collect()
    release()
    assert a == b, "VALUES DIFFER"
    print("values identical:", len(a), "rows", flush=True)

    for _ in range(2):  # warmup both
        release(); plain().count()
        release(); fanned().count()
    for rep in range(4):
        for name, v in (("plain", plain), ("fanout", fanned)):
            release()
            spark.sparkContext.setJobDescription(f"pa_step {name} rep{rep}")
            t0 = time.time()
            v().count()
            print(f"pa_step_weights {name:<7s} rep{rep}: {time.time()-t0:5.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
