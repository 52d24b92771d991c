#!/usr/bin/env python
"""Time ONE registry entry in a fresh process (cold JVM), bench
methodology: warm the JVM on revenue_forecast, then run the entry
`reps` times and print the times. Usage:

    SPARK_GRAFT_CPUS=32 python tools/one_entry.py <entry> [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_parameter_server_spark.plans import REGISTRY
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-one-entry")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["revenue_forecast"].fn(spark, sf_dir).count()
    out = []
    for i in range(reps):
        t0 = time.time()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        out.append(round(time.time() - t0, 3))
        print(f"# rep{i}: {out[-1]}s ({n} rows)", file=sys.stderr)
    print(f"{name} cpus={os.environ.get('SPARK_GRAFT_CPUS', '32')} reps={out}")


if __name__ == "__main__":
    main()
