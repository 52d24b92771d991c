#!/usr/bin/env python
"""Interleaved A/B for the two pending r15 driver-thread overlaps:
sketch_point_queries (3 sketch branches) and pa_predict_binary (2 tasks).
Serial variant rebuilt inline from the same private builders; threaded
variant is the current registry code. One process, alternating reps."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_parameter_server_spark.session import get_spark
from flink_parameter_server_spark.operators import sketches as sk
from flink_parameter_server_spark.ps import queries as psq
from flink_parameter_server_spark.ps import pa
from flink_parameter_server_spark.scratch import release

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def spq_serial(spark):
    freq = sk._lang_token_freq(spark, SF)
    return (
        sk._bloom_membership(spark, SF, freq=freq)
        .unionByName(sk._cms_frequency(spark, SF, freq=freq))
        .unionByName(sk._cms_heavy(spark, SF, freq=freq))
    )


def spq_threaded(spark):
    return sk.sketch_point_queries(spark, SF)


def pa_serial(spark):
    base = pa.predict_binary(pa.instances(spark, SF)).select(
        F.lit("embeddings").alias("task"), "row_id", "y", "y_pred", "margin"
    )
    dq = pa.doc_quality_filter(spark, SF).select(
        F.lit("doc_quality").alias("task"), "row_id", "y", "y_pred", "margin"
    )
    return base.unionByName(dq)


def pa_threaded(spark):
    return psq.pa_predict_binary(spark, SF)


def main():
    spark = get_spark("fps-ab-r15-pending")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    pairs = [
        ("sketch_point_queries", spq_serial, spq_threaded),
        ("pa_predict_binary", pa_serial, pa_threaded),
    ]
    # warmup both
    for name, a, b in pairs:
        release()
        noop(a(spark))
        release()
        noop(b(spark))
    for name, a, b in pairs:
        for rep in range(3):
            for vname, v in (("serial", a), ("threaded", b)):
                release()
                spark.sparkContext.setJobDescription(f"{name} {vname} rep{rep}")
                t0 = time.time()
                noop(v(spark))
                print(f"{name:<24s} {vname:<9s} rep{rep}: {time.time()-t0:6.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
