#!/usr/bin/env python
"""Semantic-geometry growth rehearsal (r10 receipt, extended r11 with
the counted-n rule that is now the ORACLE-CHECKED default).

The semantic family's PAIR JOIN is cell-bounded under every geometry,
but the ASSIGNMENT term differs fundamentally:

- stride64 (the RETIRED r9/r10 oracle rule, reconstructed inline here
  for the historical growth row): centroids = every 64th vector, so
  the centroid table has n/64 rows — the broadcast grows linearly with
  the corpus and the argmax-cosine pass costs n x n/64 cosines:
  QUADRATIC FLOPs (~8 GB broadcast, 1e16 cosines at 1e9 docs — the
  scale-killer VERDICT r10 carried as its one perf-weak item).
- counted_sqrt (r11, the new oracle-checked default in
  similarity.ivf_assign / planes.IVF_CENT_SQL): count n once, k =
  floor(sqrt(n)) centroids via stride ceil(n/k). DuckDB-replayable
  like the stride rule, but the broadcast is ~sqrt(n) rows and both
  assignment (n*k) and cell self-join (~n^2/k) run at n^1.5 — the
  balanced IVF sizing.
- fixed-k sampled k-means (ann_index.kmeans_assign): the trained
  quantizer. With constant k the per-cell population grows as n/k and
  the cell SELF-JOIN becomes the quadratic term (fixedk16, measured
  r10); k ~ sqrt(n) (fixedk_sqrt) matches counted_sqrt's growth with
  data-adapted cells.

This tool times pair generation end-to-end (assignment + cell
self-join + threshold, consumed via count) under the FOUR geometries
at sf0.1 and the ~sf1 replica set (tools/scale_rehearsal.py gen),
recording centroid cardinalities and pair counts: the measured form of
the "which term grows" analysis in BASELINE.md.

Usage:
  python tools/scale_rehearsal.py gen            # once, builds ~sf1
  python tools/fixedk_rehearsal.py [--reps 3] [--sf1 /tmp/sparkgraft_sf1] [--curate]

Prints one JSON line per scale:
{"sf": ..., "n_vectors": n,
 "centroid_rows"/"pairs"/"sec": {"stride64": ., "counted_sqrt": .,
                                 "fixedk16": ., "fixedk_sqrt": .},
 "curate_sec": {"counted_sqrt": ., "fixedk_sqrt": .},   # with --curate
 "probe": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sparkgraft_sf1"
N_CELLS = 16
STRIDE64 = 64


def _stride64_assign(emb):
    """The retired fixed-stride rule, reconstructed for the historical
    growth row (it no longer exists in package source)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_parameter_server_spark.functions.vectors import as_double
    from flink_parameter_server_spark.operators.similarity import _fast_cosine

    cent = emb.where(F.col("vec_id") % STRIDE64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"),
        F.col("ne").alias("nc"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid"))
    return (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "embedding", "ne", "cid",
            _fast_cosine(
                as_double(F.col("embedding")), as_double(F.col("cv")),
                F.col("ne"), F.col("nc"),
            ).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "ne", "cid")
    )


def _time_geometry(spark, sf_dir: str, geometry: str, reps: int, n_vec: int) -> tuple[float, int, int]:
    """Median wall of pair generation under `geometry`; returns
    (median_sec, pair_count, centroid_rows). The fixed-k timings
    INCLUDE quantizer training — it is part of that geometry's cost."""
    from flink_parameter_server_spark import scratch
    from flink_parameter_server_spark.functions.planes import counted_stride
    from flink_parameter_server_spark.operators.ann_index import kmeans_assign
    from flink_parameter_server_spark.operators.similarity import (
        embedding_semantic_pairs,
        embeddings_normed,
    )

    k = N_CELLS if geometry == "fixedk16" else max(N_CELLS, int(n_vec**0.5))
    samples, pairs = [], 0
    for rep in range(-1, reps):  # one untimed warmup
        scratch.release()
        spark.catalog.clearCache()
        t0 = time.time()
        if geometry == "counted_sqrt":
            # the package default — similarity.ivf_assign's counted rule
            pairs = embedding_semantic_pairs(spark, sf_dir).count()
        elif geometry == "stride64":
            emb = embeddings_normed(spark, sf_dir)
            assign = scratch.scratch(_stride64_assign(emb))
            pairs = embedding_semantic_pairs(spark, sf_dir, assign=assign).count()
        elif geometry == "counted_two_level":
            from flink_parameter_server_spark.operators.similarity import ivf2_assign

            emb = embeddings_normed(spark, sf_dir)
            assign = scratch.scratch(ivf2_assign(emb))
            pairs = embedding_semantic_pairs(spark, sf_dir, assign=assign).count()
        else:
            emb = embeddings_normed(spark, sf_dir)
            assign = scratch.scratch(kmeans_assign(spark, emb, n_cells=k))
            pairs = embedding_semantic_pairs(spark, sf_dir, assign=assign).count()
        dt = time.time() - t0
        if rep >= 0:
            samples.append(round(dt, 3))
    if geometry == "stride64":
        crows = (n_vec + STRIDE64 - 1) // STRIDE64
    elif geometry in ("counted_sqrt", "counted_two_level"):
        crows = (n_vec + counted_stride(n_vec) - 1) // counted_stride(n_vec)
    else:
        crows = k
    print(f"# {geometry}: {samples}", file=sys.stderr, flush=True)
    return round(statistics.median(samples), 3), pairs, crows


def _time_curate(spark, sf_dir: str, geometry: str, reps: int, n_vec: int) -> float:
    """Median wall of the FULL curated pipeline (corpus_curate consumed
    via count) with its semantic stage on the given geometry — the
    whole-stage companion to the pair-generation timing."""
    from flink_parameter_server_spark import scratch
    from flink_parameter_server_spark.operators.ann_index import kmeans_assign
    from flink_parameter_server_spark.operators.curate import corpus_curate
    from flink_parameter_server_spark.operators.similarity import embeddings_normed

    k = max(N_CELLS, int(n_vec**0.5))
    samples = []
    for rep in range(-1, reps):
        scratch.release()
        spark.catalog.clearCache()
        t0 = time.time()
        if geometry == "counted_sqrt":
            corpus_curate(spark, sf_dir).count()
        else:
            emb = embeddings_normed(spark, sf_dir)
            assign = scratch.scratch(kmeans_assign(spark, emb, n_cells=k))
            corpus_curate(spark, sf_dir, sem_assign=assign).count()
        dt = time.time() - t0
        if rep >= 0:
            samples.append(round(dt, 3))
    print(f"# curate/{geometry}: {samples}", file=sys.stderr, flush=True)
    return round(statistics.median(samples), 3)


def main() -> int:
    reps, sf1, curate = 3, SF1, False
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--sf1":
            sf1 = args.pop(0)
        elif a == "--curate":
            curate = True
    from flink_parameter_server_spark.operators.similarity import embeddings_normed
    from flink_parameter_server_spark.session import get_spark
    from tools.host_health import probe

    spark = get_spark("fixedk-rehearsal")
    health = probe(spark, reps=2, quiet=True)
    scales = [("sf0.1", SF01)]
    if os.path.isdir(sf1):
        scales.append(("sfx10", sf1))
    else:
        print(f"# {sf1} absent — run scale_rehearsal.py gen first", file=sys.stderr)
    for label, sf_dir in scales:
        n_vec = embeddings_normed(spark, sf_dir).count()
        out = {"sf": label, "n_vectors": n_vec, "centroid_rows": {}, "pairs": {}, "sec": {}}
        for geometry in (
            "stride64", "counted_sqrt", "counted_two_level", "fixedk16", "fixedk_sqrt"
        ):
            sec, pairs, crows = _time_geometry(spark, sf_dir, geometry, reps, n_vec)
            out["sec"][geometry] = sec
            out["pairs"][geometry] = pairs
            out["centroid_rows"][geometry] = crows
        if curate:
            out["curate_sec"] = {
                g: _time_curate(spark, sf_dir, g, reps, n_vec)
                for g in ("counted_sqrt", "fixedk_sqrt")
            }
        out["probe"] = {
            k: round(v["factor"], 2) for k, v in health["entries"].items()
        }
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
