#!/usr/bin/env python
"""Benchmark harness (driver contract): runs EVERY registry entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": headline_sec, "unit": "sec", "queries": {...}, "sf": ...}

Since round 5 (VERDICT r4 task #1) the bench covers ALL 50 registry
entries with n>=SPARK_GRAFT_BENCH_REPS (default 3) repetitions each,
reporting per-entry MEDIANS — single-run numbers moved +-20% round to
round with zero code change, so medians are the only comparable series.
`queries` therefore has 50 median keys; `value` stays the HEADLINE-20
subtotal (sum of those entries' medians) so the metric remains
comparable with BENCH_r0{1..4} and BASELINE.md; the full-registry sum
is reported separately as `full_registry_sec`.

Per-rep storage is honest: every registry fn releases the previous
query's scratch cache on entry (scratch.py), so each rep re-runs the
real plan, not a cache readback.

Since round 6 (VERDICT r5 #1/#4): the final stdout line is the COMPACT
object (medians only) so the driver's tail-capture window can always
parse it — r5's line embedded the full 50x3 `samples` dict and was so
long the capture truncated its head (BENCH_r05 `parsed: null`).  Raw
per-rep samples now go to BENCH_samples_r{N}.json alongside this file.
Additionally each entry gets ONE un-timed warmup rep before the n timed
reps: the r5 triplets showed first-rep JVM/codegen skew (e.g.
multimodal_pipeline [1.80, 0.61, 0.61]) that medians absorbed but a
warmup removes at the source, making the n reps i.i.d.  BASELINE.md
notes the series change.

Since round 16 (VERDICT r15 next-round #7/#9, additions only):
- the compact artifact stamps `default_parallelism` (sc.defaultParallelism)
  and the resolved `master` string so the driver's scaling heuristic can
  self-verify that SPARK_GRAFT_CPUS was honored (r15's
  `suspect_cpus_ignored` fired falsely);
- entries whose WARMUP rep ran under 1 s get
  $SPARK_GRAFT_BENCH_REPS_SUBSEC timed reps (default 7) instead of
  $SPARK_GRAFT_BENCH_REPS: 16 of r15's 18 "regressed" entries were
  untouched sub-second tails whose 3-rep medians moved 0.02-0.4 s on a
  drifting host. More reps on sub-second entries cost ~0.5 min total
  and cut the false-regression rate; medians stay medians, heavier
  entries keep the exact r5+ methodology. The per-entry rep count is
  recorded in the samples side file (len of each sample list).

Since round 7 (VERDICT r6 next-round #1): the bench is PROBE-GATED.
Before any timed rep it runs tools/host_health.probe() (two small
plan-stable entries vs the committed healthy-host medians in
tools/healthy_baseline.json) and stamps a top-level `host_degraded`
boolean into the compact stdout artifact; the full `host_probe`
payload goes to the BENCH_samples side file (r8 — the inline payload
re-created the r5 parsed:null truncation).  A degraded run
can therefore never silently become the round's number: the r6 driver
artifact carried a judge-verified ~1.2-1.9x uniform host factor that
was only discoverable by cross-referencing BASELINE.md prose.  Warmup
failures are likewise recorded (`warmup_errors`) instead of vanishing
into stderr, so a cold-start-only crash is visible in the artifact.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The original headline set — every operator family from SURVEY.md §2
# whose plan shape matters most at 100 TB; `value` = sum of their medians.
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
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    from flink_parameter_server_spark.plans import REGISTRY
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so the numbers measure the queries,
    # not first-touch classloading
    REGISTRY["revenue_forecast"].fn(spark, sf_dir).count()

    # Probe gate (r7): measure host throughput against the committed
    # healthy baseline BEFORE timing anything, and stamp the verdict
    # into the artifact so degraded-host seconds are self-describing.
    host_probe: dict | None = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import host_health

        host_probe = host_health.probe(spark, reps=3)
        print(f"# host probe: healthy={host_probe['healthy']} "
              + " ".join(f"{k}=x{v['factor']}" for k, v in host_probe["entries"].items()),
              file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 - a broken probe must not cost the bench
        host_probe = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"# host probe failed: {host_probe['error']}", file=sys.stderr)

    # headline entries first (metric continuity), then the rest A->Z
    names = HEADLINE + sorted(n for n in REGISTRY if n not in HEADLINE)
    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    warmup_errors: dict[str, str] = {}
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    # r16: sub-second entries get extra reps (noise control, see header).
    # target_reps stays `reps` until an entry's warmup proves it
    # sub-second; entries with no/failed warmup keep the base rep count.
    reps_subsec = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_REPS_SUBSEC", "7")))
    target_reps: dict[str, int] = {n: reps for n in names}

    def rep_sequence():
        # warmup passes first (target_reps learned there), then timed
        # passes up to the per-entry target; entries interleave within
        # each pass exactly as before so host drift spreads across all
        for r in range(-warmup, 0):
            yield r
        r = 0
        while any(r < target_reps[n] for n in names):
            yield r
            r += 1

    for rep in rep_sequence():
        timed = rep >= 0
        for name in names:
            if timed and rep >= target_reps[name]:
                continue
            t0 = time.time()
            # one broken entry (e.g. a fixture-regen surprise) must not
            # cost the round its other 49 numbers — record and move on
            try:
                n_rows = REGISTRY[name].fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                # only timed-rep failures count as entry errors; a warmup
                # hiccup followed by clean timed reps is a healthy entry
                if timed:
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                else:
                    # a cold-start-only crash is exactly what the warmup
                    # rep exists to absorb — keep a trace in the artifact
                    warmup_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# ERROR {name}: {type(exc).__name__}: {exc}"[:300], file=sys.stderr)
                continue
            dt = round(time.time() - t0, 3)
            if timed:
                samples[name].append(dt)
            elif dt < 1.0:
                target_reps[name] = reps_subsec
            tag = f"rep{rep}" if timed else "warmup"
            print(f"# {tag} {name}: {dt:.2f}s ({n_rows} rows)", file=sys.stderr)

    medians = {n: round(statistics.median(s), 3) for n, s in samples.items() if s}

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
    compact = {
        "metric": "headline_query_set_wall_time",
        "value": round(sum(medians[q] for q in HEADLINE if q in medians), 3),
        "unit": "sec",
        "queries": medians,
        "full_registry_sec": round(sum(medians.values()), 3),
        "reps": reps,
        "warmup": warmup,
        "r2_comparable_superset_subtotal": round(
            sum(medians[q] for q in r2_comparable if q in medians), 3
        ),
        "sf": float(sf),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        # r16 (VERDICT r15 #7): self-describing scaling artifacts — the
        # effective width the session actually ran with, not just the env
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
    }
    if errors:
        compact["errors"] = errors
    if warmup_errors:
        compact["warmup_errors"] = warmup_errors
    if host_probe is not None:
        compact["host_degraded"] = not host_probe.get("healthy", True)

    # Raw per-rep samples AND the full host_probe payload go to a side
    # file, NOT the stdout line: r5's inline samples made the line
    # outgrow the driver's tail-capture window (parsed:null), and r7's
    # inline host_probe re-created the same failure with a different
    # field (VERDICT r7 wrong-#2/next-#3). Only the boolean
    # `host_degraded` stamp rides inline.
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(f[len("BENCH_r"):-len(".json")])
        for f in os.listdir(here)
        if f.startswith("BENCH_r") and f.endswith(".json")
        and f[len("BENCH_r"):-len(".json")].isdigit()
    ]
    n_round = (max(rounds) + 1) if rounds else 0
    side = os.path.join(here, f"BENCH_samples_r{n_round:02d}.json")
    with open(side, "w") as fh:
        json.dump({"samples": samples, "host_probe": host_probe, **compact}, fh)
    print(f"# samples written to {side}", file=sys.stderr)

    # The compact medians-only object is the single final stdout line.
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
