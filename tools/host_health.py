#!/usr/bin/env python
"""Host-health probe: is the container fast enough to record a bench?

Late r6 the container's per-core throughput degraded ~1.7-2.6x with no
competing process (BASELINE.md host-variance notes), which makes
absolute bench seconds incomparable across runs. This probe measures
warm medians of two small, plan-stable registry entries against their
recorded healthy-host medians and prints the inflation factors. Record
a bench only when both factors are ~1.0-1.25; otherwise rely on
same-session ratios.

Healthy medians are READ from tools/healthy_baseline.json (a
provenance-stamped snapshot of the last committed healthy-host
BENCH_samples run) instead of being hard-coded here, so they cannot
silently go stale when an entry's plan changes without the baseline
file's provenance line changing too (VERDICT r6 "What's wrong" #3).

Usage: python tools/host_health.py [--reps 3]
Prints one JSON line:
{"entries": {name: {"median_sec": m, "healthy_sec": h, "factor": m/h}},
 "healthy": bool, "baseline": "<provenance>"}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.1"
# Small, plan-stable entries: one shuffle-bound (dedup_exact: sha2 +
# groupBy), one join/codegen-bound (mf_predict). Their healthy medians
# come from the baseline file below.
PROBE_ENTRIES = ("dedup_exact", "mf_predict")
BASELINE_PATH = os.path.join(_REPO, "tools", "healthy_baseline.json")
OK_FACTOR = 1.25


def load_baseline() -> dict:
    with open(BASELINE_PATH) as fh:
        return json.load(fh)


def probe(spark, reps: int = 3, quiet: bool = False) -> dict:
    """Measure the probe entries and return the health verdict object.

    Reusable from bench.py so the bench artifact can be probe-gated
    (VERDICT r6 next-round #1) without a second process spin-up.
    """
    from flink_parameter_server_spark import scratch
    from flink_parameter_server_spark.plans import REGISTRY

    base = load_baseline()
    out = {}
    for name in PROBE_ENTRIES:
        healthy = base["medians"][name]
        ts = []
        for rep in range(-1, reps):  # one untimed warmup
            scratch.release()
            t0 = time.time()
            REGISTRY[name].fn(spark, SF).count()
            if rep >= 0:
                ts.append(time.time() - t0)
        m = statistics.median(ts)
        out[name] = {
            "median_sec": round(m, 3),
            "healthy_sec": healthy,
            "factor": round(m / healthy, 2),
        }
        if not quiet:
            print(f"# {name}: {m:.3f}s x{m / healthy:.2f}", file=sys.stderr, flush=True)
    healthy_now = all(v["factor"] <= OK_FACTOR for v in out.values())
    return {
        "entries": out,
        "healthy": healthy_now,
        "baseline": base["provenance"],
    }


def main() -> int:
    reps = 3
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("host-health")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(probe(spark, reps=reps)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
