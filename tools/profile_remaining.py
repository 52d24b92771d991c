#!/usr/bin/env python
"""Warm noop-sink timings + job counts for the entries not yet examined
this round (guide §1). One process, labelled jobs."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from flink_parameter_server_spark.session import get_spark
from flink_parameter_server_spark.scratch import release

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = sys.argv[1:] or [
    "streaming_purchase_attribution",
    "mf_recommend_topk",
    "pa_step_weights",
    "events_multires_rollup",
    "ams_sketches",
    "mf_epoch_factors",
    "ps_kernel_ops",
    "revenue_by_nation",
    "multimodal_pipeline",
    "text_profile",
    "mf_negative_samples",
    "streaming_static_enrich",
    "source_format_roundtrip",
]


def main():
    spark = get_spark("fps-profile-remaining")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    qs = entrymod.queries()
    sc = spark.sparkContext
    for name in NAMES:
        fn = qs[name]
        for rep in range(3):
            release()
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, SF).count()
            dt = time.time() - t0
            print(f"{name:<34s} rep{rep}: {dt:6.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
