#!/usr/bin/env python
"""LEMP pruning receipt: measure the topk norm bound on trained factors.

BASELINE.md's third-decade rehearsal measured mf_recommend_topk
super-linear (exp 1.51) on the HASH-INIT fixture factors and argued
that is worst-case-by-construction: uniform init concentrates norms, so
the Cauchy-Schwarz bound ``unorm * inorm >= theta`` admits nearly every
pair, and exact MIPS degenerates to ~U x I dot products. The design
claim was that REAL trained factors skew norms by item popularity —
exactly what LEMP exploits. This tool is the measured receipt.

It trains both factor sides with the repo's own bidirectional PS
trainer on driver ratings (popular items absorb many SGD updates and
grow large norms; rarely-bought items stay near init), pivots the
(side, id, dim, v) output to (id, vec) tables, and runs the SAME
topk_candidates plan on (a) hash-init factors and (b) trained factors,
counting the pairs whose dot product actually had to be computed
(keep_bound_pairs=True: post band + Cauchy-Schwarz, pre theta-score
filter) against the U x I possible pairs.

Usage:
  python tools/lemp_rehearsal.py [--sf /root/testdata/sf0.1] [--epochs 3]

Prints one JSON line:
  {"sf": ..., "epochs": N,
   "norm_skew": {"init": {"p50": ..., "p99": ...}, "trained": {...}},
   "scenarios": {"init": {"users": U, "items": I, "possible": U*I,
                          "bound_pairs": B, "scored_frac": B/(U*I),
                          "candidates": C, "sec": ...},
                 "trained": {...}}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_parameter_server_spark.ps import mf
from flink_parameter_server_spark.session import get_spark

SF = "/root/testdata/sf0.1"
USER_STRIDE = 50


def factor_tables(spark, sf_dir: str, epochs: int):
    """Train both sides; pivot the long (side, id, dim, v) output to one
    (id, vec) array table per side."""
    r = mf.ratings(spark, sf_dir)
    long = mf.train_bidirectional(spark, r, epochs=epochs)

    def side(name: str):
        return (
            long.where(F.col("side") == name)
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda s: s["v"]
                ).alias("vec")
            )
        )

    # cache: each side feeds norm stats AND two scoring joins; without it
    # the whole multi-epoch trainer re-runs per consumer
    u = side("user").localCheckpoint()
    i = side("item").localCheckpoint()
    return u, i


def norm_stats(df):
    n = df.select(
        F.sqrt(F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)).alias("norm")
    )
    p50, p99 = n.approxQuantile("norm", [0.5, 0.99], 0.001)
    return {"p50": round(p50, 4), "p99": round(p99, 4), "p99_over_p50": round(p99 / p50, 2)}


def measure(spark, sf_dir: str, u=None, i=None):
    t0 = time.time()
    bound_pairs = mf.topk_candidates(
        spark, sf_dir, user_factors=u, item_factors=i, keep_bound_pairs=True
    ).count()
    cands = mf.topk_candidates(spark, sf_dir, user_factors=u, item_factors=i).count()
    sec = round(time.time() - t0, 2)
    if u is None:
        from flink_parameter_server_spark.operators._util import t as tbl

        n_users = tbl(spark, sf_dir, "customer").where(F.col("c_custkey") % USER_STRIDE == 0).count()
        n_items = tbl(spark, sf_dir, "part").count()
    else:
        n_users, n_items = u.count(), i.count()
    possible = n_users * n_items
    return {
        "users": n_users,
        "items": n_items,
        "possible": possible,
        "bound_pairs": bound_pairs,
        "scored_frac": round(bound_pairs / possible, 4),
        "candidates": cands,
        "sec": sec,
    }


def main() -> int:
    sf, epochs = SF, 3
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf = args.pop(0)
        elif a == "--epochs":
            epochs = int(args.pop(0))
    spark = get_spark("lemp-rehearsal")

    u, i = factor_tables(spark, sf, epochs)
    # trained scenario samples users at the same stride as the entry so
    # both scenarios score the same-order user population
    u_s = u.where(F.col("id") % USER_STRIDE == 0)

    out = {
        "sf": sf,
        "epochs": epochs,
        "norm_skew": {
            "init": None,  # filled below from the default build
            "trained_items": norm_stats(i),
        },
        "scenarios": {},
    }
    # hash-init items for the skew comparison
    from flink_parameter_server_spark.operators._util import t as tbl

    init_items = tbl(spark, sf, "part").select(
        F.col("p_partkey").alias("id"), mf.item_vec("p_partkey").alias("vec")
    )
    out["norm_skew"]["init"] = norm_stats(init_items)

    print("# measuring hash-init scenario...", file=sys.stderr, flush=True)
    out["scenarios"]["init"] = measure(spark, sf)
    print("# measuring trained scenario...", file=sys.stderr, flush=True)
    out["scenarios"]["trained"] = measure(spark, sf, u=u_s, i=i)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
