#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set spans every operator family in SURVEY.md §2: relational
joins/aggs/windows, as-of join, PS kernel epoch, PA step, sketches,
dedup, similarity, text stats — the queries whose plans matter at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",          # + rollup part (r3 consolidation)
    "top_unshipped_orders",
    "copurchase_recommend_top5",
    "order_window_analytics",     # + customer timeline part
    "events_session_windows",
    "events_multires_rollup",     # r2 op + hour_filled gap-fill part
    "purchase_last_click_asof",
    "mf_epoch_factors",           # init + epoch1 + epoch2
    "mf_recommend_topk",
    "pa_step_weights",            # binary + multiclass step
    "ams_sketches",               # global + daily
    "sketch_point_queries",       # bloom + count-min
    "dedup_near_dup_pairs",       # minhash + simhash + ngram + embedding
    "dedup_cluster_canonical",    # r2 op, star CC
    "embedding_ann_topk",         # brute + simhash + ivf
    "embedding_quantize",         # r2 op
    "train_test_split",           # r2 op
    "text_profile",               # quality + langid + counts + fingerprint
    "text_retrieval",             # r2 ops: tfidf + bm25 + inverted index
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_parameter_server_spark.plans import REGISTRY
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so the numbers measure the queries,
    # not first-touch classloading
    REGISTRY["revenue_forecast"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]:.2f}s ({n} rows)", file=sys.stderr)

    # Entries whose operator coverage is a SUPERSET of the r1/r2 headline
    # set (post-consolidation each merged query runs extra parts, so this
    # subtotal is a conservative upper bound on the old set's cost).
    r2_comparable = [
        "pricing_summary", "revenue_by_nation", "top_unshipped_orders",
        "copurchase_recommend_top5", "order_window_analytics",
        "events_session_windows", "purchase_last_click_asof",
        "mf_epoch_factors", "mf_recommend_topk", "pa_step_weights",
        "ams_sketches", "sketch_point_queries", "dedup_near_dup_pairs",
        "embedding_ann_topk", "text_profile",
    ]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_time",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "r2_comparable_superset_subtotal": round(
                    sum(times[q] for q in r2_comparable if q in times), 3
                ),
                "sf": float(sf),
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        )
    )


if __name__ == "__main__":
    main()
