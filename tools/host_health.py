#!/usr/bin/env python
"""Host-health probe: is the container fast enough to record a bench?

Late r6 the container's per-core throughput degraded ~1.7-2.6x with no
competing process (BASELINE.md host-variance notes), which makes
absolute bench seconds incomparable across runs. This probe measures
warm medians of two small, plan-stable registry entries against their
recorded HEALTHY medians (BENCH_samples_r06-era, healthy host) and
prints the inflation factors. Record a bench only when both factors
are ~1.0-1.2; otherwise rely on same-session ratios.

Usage: python tools/host_health.py [--reps 3]
Prints one JSON line: {"entries": {name: {"median_sec": m, "healthy_sec": h, "factor": m/h}}, "healthy": bool}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_parameter_server_spark import scratch
from flink_parameter_server_spark.plans import REGISTRY
from flink_parameter_server_spark.session import get_spark

SF = "/root/testdata/sf0.1"
# healthy-host medians from the committed BENCH_samples_r06.json run
HEALTHY = {"dedup_exact": 0.251, "mf_predict": 0.281}
OK_FACTOR = 1.25


def main() -> int:
    reps = 3
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
    spark = get_spark("host-health")
    out = {}
    for name, healthy in HEALTHY.items():
        ts = []
        for rep in range(-1, reps):  # one untimed warmup
            scratch.release()
            t0 = time.time()
            REGISTRY[name].fn(spark, SF).count()
            if rep >= 0:
                ts.append(time.time() - t0)
        m = sorted(ts)[len(ts) // 2]
        out[name] = {
            "median_sec": round(m, 3),
            "healthy_sec": healthy,
            "factor": round(m / healthy, 2),
        }
        print(f"# {name}: {m:.3f}s x{m / healthy:.2f}", file=sys.stderr, flush=True)
    healthy_now = all(v["factor"] <= OK_FACTOR for v in out.values())
    print(json.dumps({"entries": out, "healthy": healthy_now}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
