#!/usr/bin/env python
"""Interleaved in-process A/B for the r16 dedup_near_dup_pairs change:
A = the r15 build (token-hash relation + separate shingle/gram/span
scratch frames per lane), B = the r16 shared near_dup_arrays relation.
Both run the full six-lane union to a count; scratch released between
reps. Also prints the pair-set hash so equivalence is checked in the
same run.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_r16_ndp.py [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from flink_parameter_server_spark.operators.dedup import (
        NGRAM_BAND,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        dedup_simhash,
        dedup_substring_spans,
        hashed_shingles,
        near_dup_arrays,
        token_hash_arrays,
    )
    from flink_parameter_server_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_semantic_pairs,
    )
    from flink_parameter_server_spark.scratch import release
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-ab-ndp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF, "documents.parquet")).count()

    def run_lanes(builders):
        with ThreadPoolExecutor(max_workers=len(builders)) as pool:
            frames = list(pool.map(inheritable_thread_target(lambda b: b()), builders))
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("method", "doc_a", "doc_b", "score").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def emb_lanes():
        return [
            lambda: embedding_near_dup_pairs(spark, SF).select(
                F.lit("embedding").alias("method"),
                F.col("vec_a").alias("doc_a"),
                F.col("vec_b").alias("doc_b"),
                F.col("cos_sim").alias("score"),
            ),
            lambda: embedding_semantic_pairs(spark, SF).select(
                F.lit("semantic").alias("method"),
                F.col("vec_a").alias("doc_a"),
                F.col("vec_b").alias("doc_b"),
                F.col("cos_sim").alias("score"),
            ),
        ]

    def variant_a():  # r15 shape: tha + per-lane scratch frames
        tha = token_hash_arrays(spark, SF)
        sh = hashed_shingles(spark, SF, tha=tha)
        builders = [
            lambda: dedup_minhash_lsh(spark, SF, sh=sh),
            lambda: dedup_simhash(spark, SF, sh=sh),
            lambda: dedup_ngram_jaccard(spark, SF, tha=tha, corpus_key=SF),
            lambda: dedup_substring_spans(spark, SF, tha=tha),
            *emb_lanes(),
        ]
        return run_lanes(builders)

    def variant_b():  # r16 shape: one shared array relation
        rel = near_dup_arrays(spark, SF)
        sh = rel.select("doc_id", "shingles").where(F.size("shingles") > 0)
        g = rel.select(
            "doc_id", "source", "n_chars",
            F.expr(f"n_chars div {NGRAM_BAND}").alias("band"), "grams",
        ).where(F.size("grams") > 0)
        spans_df = rel.select("doc_id", "spans")
        builders = [
            lambda: dedup_minhash_lsh(spark, SF, sh=sh),
            lambda: dedup_simhash(spark, SF, sh=sh),
            lambda: dedup_ngram_jaccard(spark, SF, corpus_key=SF, g=g),
            lambda: dedup_substring_spans(spark, SF, spans_df=spans_df),
            *emb_lanes(),
        ]
        return run_lanes(builders)

    sigs = set()
    for i in range(pairs):
        for label, fn in (("A_r15", variant_a), ("B_r16", variant_b)):
            release()
            spark.sparkContext.setJobDescription(f"ndp {label} rep{i}")
            t0 = time.time()
            n, h = fn()
            dt = time.time() - t0
            sigs.add((n, h))
            print(f"{label} rep{i}: {dt:6.2f}s  n={n} h={h}", flush=True)
    print(f"signatures identical: {len(sigs) == 1}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
