"""ADC crossover sweep (VERDICT r12 #6): exact in-cell scan vs the
packed-codes ADC probe over a synthetic decade sweep at fixed cell
count. BASELINE.md r12 asserted the ADC path pays only once the raw
cells scan is memory/IO-bound (it measurably LOSES at a 20k-vector
catalog); this turns that claim into a measured trend.

Vectors are deterministic hash-generated 64-dim floats (no RNG —
FIXTURES.md discipline); one pq=True index per scale; both probes run
the same 50 queries at n_probe=2; wall = collect() of the top-k.

Usage: python tools/adc_crossover.py [n1 n2 ...]  (default 20k 200k 1m)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K = 10


def synth(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {DIM - 1}), j -> "
        "CAST(((id * 64 + j + 1) * 2654435761 % 1000003) % 2000 - 1000 AS FLOAT)"
        " / 1000.0) AS embedding",
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    import shutil
    import tempfile

    from flink_parameter_server_spark.operators.ann_index import (
        build_ivf_index,
        ivf_search,
    )
    from flink_parameter_server_spark.scratch import release
    from flink_parameter_server_spark.session import get_spark

    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 200_000, 1_000_000]
    spark = get_spark("adc-crossover")
    out = []
    for n in sizes:
        root = tempfile.mkdtemp(prefix=f"adcx_{n}_")
        idx = os.path.join(root, "idx")
        emb = synth(spark, n)
        t0 = time.time()
        build_ivf_index(spark, emb, idx, n_cells=16, iters=1, pq=True)
        t_build = time.time() - t0
        q = synth(spark, n).where(f"vec_id % {max(n // 50, 1)} = 0").selectExpr(
            "vec_id AS query_id", "embedding AS qv"
        )
        walls = {}
        for mode in ("exact", "adc"):
            t0 = time.time()
            res = ivf_search(
                spark, idx, q, k=K, n_probe=2,
                adc=(mode == "adc"), shortlist=32,
            )
            nrows = res.count()
            walls[mode] = round(time.time() - t0, 2)
            release(); assert nrows > 0
        shutil.rmtree(root, ignore_errors=True)
        row = {"n": n, "build_s": round(t_build, 1), **walls,
               "adc_over_exact": round(walls["adc"] / walls["exact"], 2)}
        out.append(row)
        print(row, flush=True)
    print(json.dumps({"metric": "adc_crossover", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
