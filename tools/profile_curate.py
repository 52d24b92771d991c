#!/usr/bin/env python
"""Stage-level decomposition of corpus_curate (guide §1): times each
stage of the curation chain in sequence — the gopher gate checkpoint,
the keeper checkpoint, the shared signature build + minhash pair set,
CC loop 1, the semantic pair set, CC loop 2, and the final assembly —
so the ~10 s the full pipeline costs at sf0.1 is attributed to real
stages instead of a single number.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_curate.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from flink_parameter_server_spark.operators._dedup_core import (
        norm_content_hash,
        shingle_sets,
        star_connected_components,
        token_hashes,
    )
    from flink_parameter_server_spark.operators._gopher_core import (
        GOPHER_FIXTURE_RULES,
        gopher_reason_frame,
    )
    from flink_parameter_server_spark.operators._util import fan_out, t
    from flink_parameter_server_spark.operators.curate import (
        CURATE_MIN_CHARS,
        CURATE_MIN_TOKENS,
        is_eval_holdout,
    )
    from flink_parameter_server_spark.operators.dedup import dedup_minhash_lsh
    from flink_parameter_server_spark.operators.similarity import (
        embedding_semantic_pairs,
        embeddings_normed,
        ivf_assign,
    )
    from flink_parameter_server_spark.functions.text import tokens
    from flink_parameter_server_spark.scratch import (
        release,
        scratch,
        tracked_checkpoint,
    )
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-profile-curate")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for rep in range(reps):
        release()
        print(f"--- rep {rep}")
        t_all0 = time.time()

        d = t(spark, SF, "documents")
        full = d.select(
            "doc_id", "lang", "source", "text", "n_chars",
            F.size(tokens(F.col("text"))).alias("n_toks"),
            is_eval_holdout().alias("is_eval"),
        )
        base = full.where(~F.col("is_eval"))
        q_ok = (F.col("n_chars") >= CURATE_MIN_CHARS) & (
            F.col("n_toks") >= CURATE_MIN_TOKENS
        )
        surv1 = base.where(q_ok)

        t0 = time.time()
        greason = tracked_checkpoint(
            gopher_reason_frame(
                fan_out(surv1.select("doc_id", "text")), GOPHER_FIXTURE_RULES
            )
        )
        print(f"  gopher gate ckpt      : {time.time() - t0:6.2f}s", flush=True)
        surv1 = surv1.join(
            greason.where(F.col("g_reason").isNotNull()).select("doc_id"),
            "doc_id",
            "left_anti",
        )

        nh = norm_content_hash("text")
        t0 = time.time()
        surv1k = tracked_checkpoint(
            surv1.withColumn(
                "e_ok",
                F.col("doc_id") == F.min("doc_id").over(Window.partitionBy(nh)),
            ).select("doc_id", "lang", "source", "e_ok")
        )
        print(f"  keeper ckpt           : {time.time() - t0:6.2f}s", flush=True)
        surv2 = surv1k.where("e_ok").select("doc_id", "lang", "source")

        eval_ids = full.where("is_eval").select("doc_id")
        sig_docs = d.select("doc_id", "text").join(
            surv2.select("doc_id").unionByName(eval_ids), "doc_id", "left_semi"
        )
        t0 = time.time()
        sh2 = scratch(shingle_sets(token_hashes(sig_docs)))
        pairs = scratch(dedup_minhash_lsh(spark, SF, sh=sh2))
        pairs.count()
        print(f"  sig build + mh pairs  : {time.time() - t0:6.2f}s", flush=True)

        sym = pairs.select(
            F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("peer")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("peer"))
        )
        contam = (
            sym.join(eval_ids.withColumnRenamed("doc_id", "peer"), "peer", "left_semi")
            .select("doc_id")
            .distinct()
            .join(surv2.select("doc_id"), "doc_id", "left_semi")
        )
        surv2d = surv2.join(contam, "doc_id", "left_anti")
        ids2d = surv2d.select("doc_id")
        edges = (
            pairs.join(ids2d.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
            .join(ids2d.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
            .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        )
        t0 = time.time()
        parents, r1 = star_connected_components(edges)
        print(f"  CC loop 1 (rounds={r1}) : {time.time() - t0:6.2f}s", flush=True)
        rooted = surv2d.join(
            parents.select(F.col("a").alias("doc_id"), F.col("b").alias("root")),
            "doc_id",
            "left",
        ).select(
            "doc_id", "lang", "source", F.coalesce("root", "doc_id").alias("root")
        )
        surv3 = rooted.where(F.col("root") == F.col("doc_id"))

        t0 = time.time()
        assign = tracked_checkpoint(ivf_assign(embeddings_normed(spark, SF)))
        print(f"  ivf assign ckpt       : {time.time() - t0:6.2f}s", flush=True)

        ids3 = surv3.select("doc_id")
        t0 = time.time()
        sem_edges = (
            embedding_semantic_pairs(spark, SF, assign=assign)
            .join(ids3.withColumnRenamed("doc_id", "vec_a"), "vec_a", "left_semi")
            .join(ids3.withColumnRenamed("doc_id", "vec_b"), "vec_b", "left_semi")
            .select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
        )
        parents2, r2 = star_connected_components(sem_edges)
        print(f"  sem pairs + CC2 (r={r2}): {time.time() - t0:6.2f}s", flush=True)
        rooted2 = surv3.join(
            parents2.select(F.col("a").alias("doc_id"), F.col("b").alias("sroot")),
            "doc_id",
            "left",
        ).select(
            "doc_id", "lang", "source", F.coalesce("sroot", "doc_id").alias("sroot")
        )
        surv4 = rooted2.where(F.col("sroot") == F.col("doc_id"))

        from flink_parameter_server_spark.functions.hashing import int_hash
        from flink_parameter_server_spark.operators.curate import CURATE_SEED, N_TILES

        win = Window.partitionBy("lang", "source").orderBy(
            int_hash(F.col("doc_id"), 0, CURATE_SEED), F.col("doc_id")
        )
        tile = F.ntile(N_TILES).over(win)
        tiles = surv4.select(
            "doc_id",
            F.when(tile <= 8, F.lit("train"))
            .when(tile == 9, F.lit("valid"))
            .otherwise(F.lit("test"))
            .alias("final_split"),
        )
        dec = F.when(F.col("is_eval"), F.lit("eval_holdout")).when(
            ~F.coalesce("q_ok", F.lit(False)), F.lit("rejected:quality")
        ).when(
            F.col("g_reason").isNotNull(),
            F.concat(F.lit("rejected:quality:"), F.col("g_reason")),
        )
        out = (
            full.select("doc_id", "lang", "source", "is_eval", q_ok.alias("q_ok"))
            .join(surv1k.select("doc_id", "e_ok"), "doc_id", "left")
            .join(contam.withColumn("is_contam", F.lit(True)), "doc_id", "left")
            .join(rooted.select("doc_id", "root"), "doc_id", "left")
            .join(rooted2.select("doc_id", "sroot"), "doc_id", "left")
            .join(tiles, "doc_id", "left")
            .join(greason, "doc_id", "left")
            .select(
                "doc_id", "lang", "source",
                dec.when(~F.col("e_ok"), F.lit("rejected:exact_dup"))
                .when(F.coalesce("is_contam", F.lit(False)), F.lit("rejected:contaminated"))
                .when(F.col("root") != F.col("doc_id"), F.lit("rejected:near_dup"))
                .when(F.col("sroot") != F.col("doc_id"), F.lit("rejected:semantic_dup"))
                .otherwise(F.col("final_split"))
                .alias("split"),
            )
        )
        t0 = time.time()
        noop(out)
        print(f"  final assembly (noop) : {time.time() - t0:6.2f}s", flush=True)
        print(f"  TOTAL                 : {time.time() - t_all0:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
