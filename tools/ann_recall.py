"""Recall@10-vs-brute receipt across the ANN method family (VERDICT
r12 #5): ivf / ivf2 / ivf2 multi-probe (p=2, p=4) / ivfpq, on both
fixture scales. The brute method shares the query set (vec_id % 50 ==
0), so recall is a cheap per-query set intersection.

Usage: python tools/ann_recall.py  (prints one markdown table for
BASELINE.md + a JSON line).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall_at_k(method_sets, brute_sets) -> float:
    num = den = 0
    for qid, want in brute_sets.items():
        got = method_sets.get(qid, set())
        num += len(got & want)
        den += min(K, len(want))
    return num / den if den else 0.0


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from flink_parameter_server_spark.operators import similarity as sim
    from flink_parameter_server_spark.scratch import release as scratch_release
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("ann-recall")
    rows = []
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        brute = _topk_sets(sim.embedding_cosine_topk(spark, sf, k=K))
        methods = {
            "ivf": lambda: sim.embedding_ivf_ann(spark, sf, k=K),
            "ivf2": lambda: sim.embedding_ivf2_ann(spark, sf, probes=1, k=K),
            "ivf2_p2": lambda: sim.embedding_ivf2_ann(spark, sf, probes=2, k=K),
            "ivf2_p4": lambda: sim.embedding_ivf2_ann(spark, sf, probes=4, k=K),
            "ivfpq": lambda: sim.embedding_ivfpq_ann(spark, sf, k=K),
        }
        rec = {}
        for name, fn in methods.items():
            rec[name] = round(recall_at_k(_topk_sets(fn()), brute), 4)
            scratch_release()
        rows.append((sf.rsplit("/", 1)[-1], rec))
        print(f"{sf}: {rec}", flush=True)
    print("\n| sf | ivf | ivf2 | ivf2_p2 | ivf2_p4 | ivfpq |")
    print("|---|---|---|---|---|---|")
    for sf, rec in rows:
        print(
            f"| {sf} | {rec['ivf']} | {rec['ivf2']} | {rec['ivf2_p2']} "
            f"| {rec['ivf2_p4']} | {rec['ivfpq']} |"
        )
    print(json.dumps({"metric": "ann_recall_at_10", "rows": dict(rows)}))
    spark.stop()


if __name__ == "__main__":
    main()
