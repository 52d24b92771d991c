#!/usr/bin/env python
"""Persisted-IVF serving-lane scale receipt (r15): build + search wall
times across two decades of catalog size.

The in-query ANN entry has a measured second-decade exponent
(BASELINE.md r14, scale_rehearsal sfx10); the PERSISTED lane
(build_ivf_index / ivf_search) — the one a serving deployment actually
runs — did not. This tool measures it on replica-derived catalogs
(never hand-rolled rows, the scale_rehearsal discipline): sf0.1
embeddings (2k vectors) replicated with key offsets and circular
dimension shifts (norm-preserving; shift i%dim keeps within-replica
geometry identical while cross-replica vectors stop colliding) at x10
(20k) and x100 (200k).

Per size: one timed build (counted sqrt(n) cells, pq=True,
by_residual=True — the serving configuration the recall receipts pin)
and probe-gated medians of exact n_probe=4 and ADC n_probe=4 with the
per-probe window contract over a fixed 40-query set, so query-side
work is CONSTANT and the measured slope is the catalog's.

Usage: python tools/ivf_scale.py [--reps 3]
Prints per-size rows + one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_ROOT = "/root/tmpwork/ivf_scale"
OFF = 10_000_000
DIM = 64
N_QUERIES = 40
FACTORS = (1, 10, 100)


def _gen(spark, factor: int) -> str:
    out = f"{OUT_ROOT}/emb_x{factor}"
    base = spark.read.parquet(SRC).select("vec_id", "embedding")
    reps = []
    for i in range(factor):
        s = i % DIM
        shifted = (
            F.col("embedding")
            if s == 0
            else F.expr(
                f"concat(slice(embedding, {s + 1}, {DIM - s}), "
                f"slice(embedding, 1, {s}))"
            )
        )
        reps.append(
            base.select(
                (F.col("vec_id") + F.lit(i * OFF)).alias("vec_id"),
                shifted.cast("array<float>").alias("embedding"),
            )
        )
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(max(4, factor)).write.mode("overwrite").parquet(out)
    return out


def _queries(spark, emb_path: str):
    # fixed-size query set regardless of catalog size: the first
    # N_QUERIES of replica 0 in vec_id order (driver-data-derived)
    return (
        spark.read.parquet(emb_path)
        .where(F.col("vec_id") < OFF)
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )


def main() -> int:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from flink_parameter_server_spark.operators.ann_index import (
        build_ivf_index,
        index_stats,
        ivf_search,
    )
    from flink_parameter_server_spark.scratch import release as scratch_release
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("ivf-scale")
    rows = {}
    for factor in FACTORS:
        emb_path = _gen(spark, factor)
        emb = spark.read.parquet(emb_path)
        n = emb.count()
        n_cells = max(16, int(n**0.5))
        idx = f"{OUT_ROOT}/idx_x{factor}"
        t0 = time.monotonic()
        build_ivf_index(
            spark, emb, idx, n_cells=n_cells, iters=2, pq=True, by_residual=True
        )
        build_s = round(time.monotonic() - t0, 2)
        scratch_release()
        # r15 bounded-sample trainer: FAISS-convention 256/cell cap —
        # a genuine sample only where n > 256 * n_cells (x100 here);
        # below that the cap covers the catalog and the timing is an
        # honest overhead-of-the-cap measurement
        t0 = time.monotonic()
        build_ivf_index(
            spark, emb, f"{idx}_sampled", n_cells=n_cells, iters=2, pq=True,
            by_residual=True, train_max_per_cell=256,
        )
        build_sampled_s = round(time.monotonic() - t0, 2)
        scratch_release()
        # r15: both build-side levers — bounded-sample training AND the
        # two-level assignment prune (~2n*sqrt(k) vs n*k on the one
        # full-catalog pass the index requires)
        t0 = time.monotonic()
        build_ivf_index(
            spark, emb, f"{idx}_2l", n_cells=n_cells, iters=2, pq=True,
            by_residual=True, train_max_per_cell=256, two_level=True,
        )
        build_2l_sampled_s = round(time.monotonic() - t0, 2)
        scratch_release()
        q = _queries(spark, emb_path).cache()
        q.count()
        row = {
            "n": n,
            "n_cells": n_cells,
            "build_s": build_s,
            "build_sampled_s": build_sampled_s,
            "build_2l_sampled_s": build_2l_sampled_s,
            "train_rows_sampled": min(n, 256 * n_cells),
        }
        for name, kw in (
            ("exact_p4", dict(n_probe=4)),
            (
                "adc_p4",
                dict(n_probe=4, adc=True, shortlist=32, shortlist_per_probe=True),
            ),
        ):
            ts = []
            for _ in range(reps):
                t0 = time.monotonic()
                ivf_search(spark, idx, q, k=10, **kw).count()
                ts.append(time.monotonic() - t0)
                scratch_release()
            row[name] = round(statistics.median(ts), 3)
        row["p50_cell"] = index_stats(spark, idx)["p50_cell"]
        rows[f"x{factor}"] = row
        print(f"x{factor}: {row}", flush=True)
        q.unpersist()
    print(json.dumps({"metric": "ivf_scale", "rows": rows, "reps": reps}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
