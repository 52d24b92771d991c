#!/usr/bin/env python
"""Interleaved A/B for ps_train_epochs' input materialization order
(r16 follow-up): serial `rat.count(); inst.count()` vs the two counts
overlapped on driver threads (guide §2.6 — they are independent jobs).

Measures ONLY the input-materialization segment (the candidate change),
then the full entry under each variant, interleaved A/B/A/B in one
process; asserts the entry row count is identical under both.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_r16_pste_inputs.py [pairs]
"""
from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import inheritable_thread_target

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from flink_parameter_server_spark.ps import mf, pa
    from flink_parameter_server_spark.scratch import release, scratch
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-ab-pste-inputs")
    spark.sparkContext.setLogLevel("ERROR")

    def seg_serial():
        rat = scratch(mf.ratings(spark, SF))
        inst = scratch(pa.instances(spark, SF))
        rat.count()
        inst.count()

    def seg_threaded():
        rat = scratch(mf.ratings(spark, SF))
        inst = scratch(pa.instances(spark, SF))
        with ThreadPoolExecutor(max_workers=2) as pool:
            list(
                pool.map(
                    inheritable_thread_target(lambda df: df.count()), [rat, inst]
                )
            )

    print("# input-materialization segment only:")
    for i in range(pairs):
        for label, fn in (("serial", seg_serial), ("thread", seg_threaded)):
            release()
            t0 = time.time()
            fn()
            print(f"  seg {label} rep{i}: {time.time() - t0:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
