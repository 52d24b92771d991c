#!/usr/bin/env python
"""Decompose streaming_purchase_attribution (VERDICT r15 #8): where do
its ~3 s go? Splits construction / stream run / collect, and dumps the
per-micro-batch durationMs from the StreamingQuery progress events —
batch 0 (the data batch) vs batch 1 (the no-new-data watermark-commit
batch the leftOuter facet REQUIRES to emit null-click rows).

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_spa.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from flink_parameter_server_spark.session import get_spark
    from flink_parameter_server_spark.streaming.joins import (
        purchase_click_attribution_stream,
    )
    from flink_parameter_server_spark.streaming.windows import (
        stream_shuffle_partitions,
    )

    spark = get_spark("fps-profile-spa")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + parquet footer
    spark.read.parquet(os.path.join(SF, "events.parquet")).count()

    for rep in range(reps):
        t0 = time.time()
        sdf = purchase_click_attribution_stream(spark, SF, how="leftOuter")
        t_construct = time.time() - t0

        name = f"spa_prof_{uuid.uuid4().hex[:8]}"
        t1 = time.time()
        with stream_shuffle_partitions(spark):
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        t_run = time.time() - t1

        t2 = time.time()
        n = spark.table(name).count()
        t_collect = time.time() - t2

        batches = []
        for p in q.recentProgress:
            d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
            bid = p["batchId"] if isinstance(p, dict) else json.loads(p.json)["batchId"]
            nrows = p.get("numInputRows") if isinstance(p, dict) else None
            batches.append((bid, nrows, d))
        print(f"rep{rep}: construct={t_construct:.2f}s run={t_run:.2f}s "
              f"collect={t_collect:.2f}s rows={n}")
        for bid, nrows, d in batches:
            print(f"  batch {bid} (inputRows={nrows}): {d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
