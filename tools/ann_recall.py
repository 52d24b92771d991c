"""Recall@10-vs-brute receipt across the ANN method family (VERDICT
r12 #5, extended r14 per VERDICT r13 #4/#5, extended r15 per VERDICT
r14 #2/#3): ivf / ivf2 / ivf2 multi-probe (p=2, p=4) / ivfpq, on both
fixture scales, PLUS

- a SHORTLIST sweep for ivfpq (10/32/64) and the persisted
  ivf_search(adc=True) lane at the same settings — separating ADC
  ranking loss (what a bigger refine window repairs) from the
  refine-window truncation itself;
- a CLUSTERED synthetic corpus (the r7 operating-point generator: 8
  well-separated centers, tight noise) so the table shows the
  near-uniform fixture FLOOR and the clustered OPERATING POINT side
  by side;
- (r15, VERDICT r14 #3) an N_PROBE sweep (1/2/4/8) on the persisted
  lane at the clustered operating point — exact and ADC-s32 — closing
  the r14 loop: exact_p1's 0.30 ceiling there is PROBE loss (true
  neighbors scatter across a cluster's ~8 sub-cells), and this column
  shows n_probe recovering it;
- (r15, VERDICT r14 #2) a DENSITY experiment on the clustered corpus
  (n_cells=8 == clusters, ~500 candidates/cell — the regime where the
  r14 receipt showed BOTH 4-bit modes stop ranking): by-residual
  indexes at pq_bits=4 vs pq_bits=8 across the shortlist sweep;
- (r15 follow-on) the PER-PROBE WINDOW contract
  (ivf_search(shortlist_per_probe=True)) on the n_probe sweep — the
  committed fix for the fixed-window dilution — and a FINER-CELLS
  sweep (n_cells=64 on the clustered corpus, ~62 candidates/cell)
  measuring the operating-point guide's claimed lever at the density
  floor: finer cells + multi-probe where wider codes don't rank.

The brute method shares the query set (vec_id % 50 == 0), so recall
is a cheap per-query set intersection.

Usage: python tools/ann_recall.py  (prints markdown tables for
BASELINE.md + JSON lines).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
SHORTLISTS = (10, 32, 64)
N_PROBES = (1, 2, 4, 8)
CLUSTERED_DIR = "/root/tmpwork/ann_recall_clustered"
IDX_ROOT = "/root/tmpwork/ann_recall_idx"


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


def _gen_clustered(spark, out: str, n: int = 4000, dim: int = 64) -> None:
    """The r7 operating-point corpus (tests/test_ann_index.py clustered
    pin, scaled up): 8 well-separated centers, noise sigma 0.1 — every
    true top-10 neighbor is same-cluster by construction."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(8, dim)) * 10.0
    vecs = [
        (centers[i % 8] + rng.normal(size=dim) * 0.1).astype("float32")
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        {"vec_id": list(range(n)), "embedding": [v.tolist() for v in vecs],
         "label": [i % 8 for i in range(n)]}
    )
    os.makedirs(out, exist_ok=True)
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def _fixture_queries(spark, sf: str):
    from pyspark.sql import functions as F

    from flink_parameter_server_spark.operators.similarity import embeddings_normed

    return (
        embeddings_normed(spark, sf)
        .where(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )


def _persisted_adc_sets(
    spark, sf: str, idx: str, shortlist: int, n_probe: int = 1,
    shortlist_per_probe: bool = False,
):
    from flink_parameter_server_spark.operators.ann_index import ivf_search

    return _topk_sets(
        ivf_search(
            spark, idx, _fixture_queries(spark, sf), k=K, n_probe=n_probe,
            adc=True, shortlist=shortlist,
            shortlist_per_probe=shortlist_per_probe,
        )
    )


def _sweep(spark, sf: str, label: str) -> dict:
    from flink_parameter_server_spark.operators import similarity as sim
    from flink_parameter_server_spark.operators.ann_index import build_ivf_index
    from flink_parameter_server_spark.scratch import release as scratch_release

    brute = _topk_sets(sim.embedding_cosine_topk(spark, sf, k=K))
    methods = {
        "ivf": lambda: sim.embedding_ivf_ann(spark, sf, k=K),
        "ivf2": lambda: sim.embedding_ivf2_ann(spark, sf, probes=1, k=K),
        "ivf2_p2": lambda: sim.embedding_ivf2_ann(spark, sf, probes=2, k=K),
        "ivf2_p4": lambda: sim.embedding_ivf2_ann(spark, sf, probes=4, k=K),
    }
    for s in SHORTLISTS:
        methods[f"ivfpq_s{s}"] = (
            lambda s=s: sim.embedding_ivfpq_ann(spark, sf, k=K, shortlist=s)
        )
        methods[f"ivfpqr_s{s}"] = (
            lambda s=s: sim.embedding_ivfpq_res_ann(spark, sf, k=K, shortlist=s)
        )
    rec = {}
    for name, fn in methods.items():
        rec[name] = round(recall_at_k(_topk_sets(fn()), brute), 4)
        scratch_release()
    # persisted IVFADC lane, same query set / k / shortlist sweep —
    # plain PQ and the r14 by-residual mode side by side. Cells sized
    # sqrt(n) to MATCH the in-query lanes' counted-n geometry (the r13
    # 16-cell default left ~n/16 candidates per cell — at 4k clustered
    # vectors that is top-10-of-250+ near-equidistant candidates, the
    # regime where 32-bit codes of EITHER mode are noise-floor)
    emb = sim.embeddings_normed(spark, sf).select("vec_id", "embedding")
    n_cells = max(16, int(emb.count() ** 0.5))
    for mode, by_res in (("adc", False), ("res", True)):
        idx = f"{IDX_ROOT}_{label}_{mode}"
        build_ivf_index(spark, emb, idx, n_cells=n_cells, pq=True, by_residual=by_res)
        for s in SHORTLISTS:
            rec[f"{mode}_s{s}"] = round(
                recall_at_k(_persisted_adc_sets(spark, sf, idx, s), brute), 4
            )
            scratch_release()
    # the exact (non-ADC) probe at the same geometry/n_probe: the
    # CEILING the adc/res columns are chasing — separates probe loss
    # (cells not probed) from ADC ranking loss (shortlist misses)
    from flink_parameter_server_spark.operators.ann_index import ivf_search

    queries = _fixture_queries(spark, sf)
    rec["exact_p1"] = round(
        recall_at_k(
            _topk_sets(
                ivf_search(spark, f"{IDX_ROOT}_{label}_res", queries, k=K, n_probe=1)
            ),
            brute,
        ),
        4,
    )
    scratch_release()
    # r15 (VERDICT r14 #3): the n_probe sweep at the same persisted
    # geometry — exact (the probe-loss curve: candidate sets are
    # supersets as n_probe grows, so recall is provably non-decreasing,
    # pinned in tests/test_ann_index.py) and ADC at s=32 (where the
    # refine window had fully repaired ADC ranking loss at n_probe=1)
    for p in N_PROBES[1:]:
        rec[f"exact_p{p}"] = round(
            recall_at_k(
                _topk_sets(
                    ivf_search(
                        spark, f"{IDX_ROOT}_{label}_res", queries, k=K, n_probe=p
                    )
                ),
                brute,
            ),
            4,
        )
        scratch_release()
        rec[f"res_s32_p{p}"] = round(
            recall_at_k(
                _persisted_adc_sets(
                    spark, sf, f"{IDX_ROOT}_{label}_res", 32, n_probe=p
                ),
                brute,
            ),
            4,
        )
        scratch_release()
        # r15 follow-on: the same probe with the per-probe window
        # contract (shortlist_per_probe=True, s=32 per probed cell) —
        # the committed fix for the fixed-window dilution above
        rec[f"res_s32pp_p{p}"] = round(
            recall_at_k(
                _persisted_adc_sets(
                    spark, sf, f"{IDX_ROOT}_{label}_res", 32, n_probe=p,
                    shortlist_per_probe=True,
                ),
                brute,
            ),
            4,
        )
        scratch_release()
    return rec


def _density_sweep(spark, sf: str, label: str) -> dict:
    """VERDICT r14 #2 receipt: by-residual indexes at the ~500
    candidates/cell density (n_cells=8 == the generator's clusters) at
    pq_bits=4 vs pq_bits=8, shortlist sweep at n_probe=1. The r14
    honest bound said both 4-bit modes stop ranking here; the 8-bit
    column is the named escape hatch, measured."""
    from flink_parameter_server_spark.operators import similarity as sim
    from flink_parameter_server_spark.operators.ann_index import (
        build_ivf_index,
        ivf_search,
    )
    from flink_parameter_server_spark.scratch import release as scratch_release

    emb = sim.embeddings_normed(spark, sf).select("vec_id", "embedding")
    queries = _fixture_queries(spark, sf)
    rec = {}
    brute = None
    for bits in (4, 8):
        idx = f"{IDX_ROOT}_{label}_dens{bits}"
        build_ivf_index(
            spark, emb, idx, n_cells=8, iters=3, pq=True, by_residual=True,
            pq_bits=bits,
        )
        if brute is None:
            # covering probe (n_probe == n_cells) == global brute
            brute = _topk_sets(ivf_search(spark, idx, queries, k=K, n_probe=8))
            rec["exact_p1_dens"] = round(
                recall_at_k(
                    _topk_sets(ivf_search(spark, idx, queries, k=K, n_probe=1)),
                    brute,
                ),
                4,
            )
            scratch_release()
        for s in SHORTLISTS:
            rec[f"d{bits}_s{s}"] = round(
                recall_at_k(_persisted_adc_sets(spark, sf, idx, s), brute), 4
            )
            scratch_release()
    return rec


def _finer_cells_sweep(spark, sf: str, label: str) -> dict:
    """r15 follow-on: the operating-point guide's claim for the ~500
    candidates/cell density floor — FINER CELLS (restore a rankable
    per-cell density) + multi-probe (recover the scatter) — measured at
    the exact geometry where the density receipt showed neither code
    width ranks (n_cells=8, d4_s32=0.059). Same corpus, n_cells=64
    (~62 candidates/cell), by-residual 4-bit, n_probe sweep with the
    per-probe window contract."""
    from flink_parameter_server_spark.operators import similarity as sim
    from flink_parameter_server_spark.operators.ann_index import (
        build_ivf_index,
        ivf_search,
    )
    from flink_parameter_server_spark.scratch import release as scratch_release

    emb = sim.embeddings_normed(spark, sf).select("vec_id", "embedding")
    queries = _fixture_queries(spark, sf)
    idx = f"{IDX_ROOT}_{label}_finer"
    build_ivf_index(
        spark, emb, idx, n_cells=64, iters=3, pq=True, by_residual=True
    )
    brute = _topk_sets(ivf_search(spark, idx, queries, k=K, n_probe=64))
    rec = {}
    for p in N_PROBES + (16,):
        rec[f"f64_exact_p{p}"] = round(
            recall_at_k(
                _topk_sets(ivf_search(spark, idx, queries, k=K, n_probe=p)), brute
            ),
            4,
        )
        scratch_release()
        rec[f"f64_adc_pp_p{p}"] = round(
            recall_at_k(
                _persisted_adc_sets(
                    spark, sf, idx, 32, n_probe=p, shortlist_per_probe=True
                ),
                brute,
            ),
            4,
        )
        scratch_release()
    return rec


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("ann-recall")
    _gen_clustered(spark, CLUSTERED_DIR)
    rows = []
    for label, sf in (
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("clustered-4k", CLUSTERED_DIR),
    ):
        rec = _sweep(spark, sf, label)
        rows.append((label, rec))
        print(f"{label}: {rec}", flush=True)
    dens = _density_sweep(spark, CLUSTERED_DIR, "clustered-4k")
    print(f"density clustered-4k: {dens}", flush=True)
    finer = _finer_cells_sweep(spark, CLUSTERED_DIR, "clustered-4k")
    print(f"finer-cells clustered-4k: {finer}", flush=True)
    cols = (
        ["ivf", "ivf2", "ivf2_p2", "ivf2_p4"]
        + [f"ivfpq_s{s}" for s in SHORTLISTS]
        + [f"ivfpqr_s{s}" for s in SHORTLISTS]
        + ["exact_p1"]
        + [f"adc_s{s}" for s in SHORTLISTS]
        + [f"res_s{s}" for s in SHORTLISTS]
    )
    print("\n| corpus | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for label, rec in rows:
        print(f"| {label} | " + " | ".join(str(rec[c]) for c in cols) + " |")
    # r15 n_probe sweep table (persisted res index, sqrt(n) cells)
    pcols = [f"exact_p{p}" for p in N_PROBES] + [
        f"res_s32_p{p}" for p in N_PROBES[1:]
    ]
    pcols.insert(len(N_PROBES), "res_s32_p1")
    print("\n| corpus | " + " | ".join(pcols) + " |")
    print("|" + "---|" * (len(pcols) + 1))
    for label, rec in rows:
        rec["res_s32_p1"] = rec["res_s32"]
        print(f"| {label} | " + " | ".join(str(rec[c]) for c in pcols) + " |")
    # r15 follow-on: per-probe window contract columns
    ppcols = ["res_s32_p1"] + [f"res_s32pp_p{p}" for p in N_PROBES[1:]]
    print("\n| corpus | " + " | ".join(ppcols) + " |")
    print("|" + "---|" * (len(ppcols) + 1))
    for label, rec in rows:
        print(f"| {label} | " + " | ".join(str(rec[c]) for c in ppcols) + " |")
    # r15 follow-on: finer-cells lever at the density floor
    fcols = [f"f64_exact_p{p}" for p in N_PROBES + (16,)] + [
        f"f64_adc_pp_p{p}" for p in N_PROBES + (16,)
    ]
    print("\n| corpus | " + " | ".join(fcols) + " |")
    print("|" + "---|" * (len(fcols) + 1))
    print(
        "| clustered-4k-finer | "
        + " | ".join(str(finer[c]) for c in fcols)
        + " |"
    )
    # r15 density table (clustered-4k, n_cells=8 == clusters, ~500/cell)
    dcols = ["exact_p1_dens"] + [f"d4_s{s}" for s in SHORTLISTS] + [
        f"d8_s{s}" for s in SHORTLISTS
    ]
    print("\n| corpus | " + " | ".join(dcols) + " |")
    print("|" + "---|" * (len(dcols) + 1))
    print("| clustered-4k-dens | " + " | ".join(str(dens[c]) for c in dcols) + " |")
    print(json.dumps({"metric": "ann_recall_at_10", "rows": dict(rows),
                      "density": dens, "finer_cells": finer}))
    spark.stop()


if __name__ == "__main__":
    main()
