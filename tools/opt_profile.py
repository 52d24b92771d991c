#!/usr/bin/env python
"""Per-part decomposition timings for the heavy registry entries
(guide §1: isolate each expensive query with the noop sink so we time
the computation, not the sink; label jobs).

Usage: python tools/opt_profile.py <target> [reps]
Targets: tts (train_test_split), pste (ps_train_epochs),
         ann (embedding_ann_topk), ndp (dedup_near_dup_pairs),
         dcc (dedup_cluster_canonical), copur (copurchase),
         tr (text_retrieval), ss (streaming_sessions)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_parameter_server_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, build, reps=2, consume=noop):
    """build() -> df each rep (fresh plan); consume with noop sink."""
    for rep in range(reps):
        from flink_parameter_server_spark.scratch import release

        release()
        spark.sparkContext.setJobDescription(f"{label} rep{rep}")
        t0 = time.time()
        consume(build())
        dt = time.time() - t0
        print(f"  {label:<42s} rep{rep}: {dt:6.2f}s", flush=True)


def main() -> int:
    target = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("fps-opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    if target == "tts":
        from flink_parameter_server_spark.operators import mlprep
        from flink_parameter_server_spark.operators._dsir_core import dsir_micro
        from flink_parameter_server_spark.operators._gopher_core import GOPHER_FIXTURE_RULES
        from flink_parameter_server_spark.operators._util import t
        from flink_parameter_server_spark.operators.curate import corpus_curate
        from flink_parameter_server_spark.operators.similarity import (
            embeddings_normed,
            ivf_assign,
        )
        from flink_parameter_server_spark.plans.registry import REGISTRY
        from flink_parameter_server_spark.scratch import tracked_checkpoint

        d = t(spark, SF, "documents")
        timed(spark, "full entry (count)", lambda: REGISTRY["train_test_split"].fn(spark, SF), reps, lambda df: df.count())
        timed(spark, "ivf_assign build (checkpoint)", lambda: tracked_checkpoint(ivf_assign(embeddings_normed(spark, SF))), reps, lambda df: None)
        timed(spark, "dsir_micro build (checkpoint)", lambda: tracked_checkpoint(dsir_micro(d.select("doc_id", "lang", "text"))), reps, lambda df: None)
        timed(spark, "curated (corpus_curate full)", lambda: corpus_curate(spark, SF, sem_assign=tracked_checkpoint(ivf_assign(embeddings_normed(spark, SF))), quality_rules=GOPHER_FIXTURE_RULES), reps)
        timed(spark, "packed part", lambda: mlprep._packed_part(d), reps)
        timed(spark, "mixture part", lambda: mlprep._mixture_part(d), reps)
        w = None

        def dsel():
            nonlocal w
            w = tracked_checkpoint(dsir_micro(d.select("doc_id", "lang", "text")))
            return mlprep._dsir_selected_part(d, w)

        timed(spark, "dsir_selected (incl build)", dsel, reps)
        timed(spark, "cluster_balance (incl assign)", lambda: mlprep._cluster_balance_part(tracked_checkpoint(ivf_assign(embeddings_normed(spark, SF))), d), reps)

    elif target == "pste":
        from flink_parameter_server_spark.ps import mf, pa
        from flink_parameter_server_spark.ps.queries import mf_negative_samples
        from flink_parameter_server_spark.scratch import scratch

        timed(spark, "ratings build (persist+count)", lambda: scratch(mf.ratings(spark, SF)), reps, lambda df: df.count())
        timed(spark, "mf.train epochs=2", lambda: mf.train(spark, scratch(mf.ratings(spark, SF)), epochs=2), reps)
        timed(spark, "mf.train_bidirectional epochs=2", lambda: mf.train_bidirectional(spark, scratch(mf.ratings(spark, SF)), epochs=2), reps)
        timed(spark, "pa.train_binary epochs=2", lambda: pa.train_binary(spark, scratch(pa.instances(spark, SF)), epochs=2), reps)
        timed(spark, "pa.train_multiclass epochs=2", lambda: pa.train_multiclass(spark, scratch(pa.instances(spark, SF)), epochs=2), reps)

        def mfneg():
            negs = (
                mf_negative_samples(spark, SF)
                .where(F.col("memory") == "full")
                .select("user", F.col("neg_item").alias("item"), F.lit(0.0).alias("rating"))
            )
            return mf.train(spark, scratch(mf.ratings(spark, SF)).unionByName(negs), epochs=1)

        timed(spark, "mf_neg train epochs=1", mfneg, reps)

    elif target == "ann":
        from flink_parameter_server_spark.operators.similarity import (
            embedding_cosine_topk,
            embedding_ivf2_ann,
            embedding_ivf_ann,
            embedding_ivfpq_ann,
            embedding_ivfpq_res_ann,
            embedding_simhash_ann,
            embeddings_normed,
            ivf2_assign,
            ivf_assign,
            IVF2_PROBES,
        )
        from flink_parameter_server_spark.scratch import scratch

        timed(spark, "brute", lambda: embedding_cosine_topk(spark, SF), reps)
        timed(spark, "simhash", lambda: embedding_simhash_ann(spark, SF), reps)
        timed(spark, "ivf_assign build (persist+count)", lambda: scratch(ivf_assign(embeddings_normed(spark, SF))), reps, lambda df: df.count())

        def with_a1(fn):
            a1 = scratch(ivf_assign(embeddings_normed(spark, SF)))
            return fn(spark, SF, _assign=a1)

        timed(spark, "ivf (incl assign)", lambda: with_a1(embedding_ivf_ann), reps)
        timed(spark, "ivfpq (incl assign)", lambda: with_a1(embedding_ivfpq_ann), reps)
        timed(spark, "ivfpq_res (incl assign)", lambda: with_a1(embedding_ivfpq_res_ann), reps)
        timed(spark, "ivf2_assign build (persist+count)", lambda: scratch(ivf2_assign(embeddings_normed(spark, SF))), reps, lambda df: df.count())

        def with_a2(probes):
            a2 = scratch(ivf2_assign(embeddings_normed(spark, SF)))
            return embedding_ivf2_ann(spark, SF, probes=probes, _assign=a2)

        timed(spark, "ivf2 (incl assign)", lambda: with_a2(1), reps)
        timed(spark, "ivf2_p2 (incl assign)", lambda: with_a2(IVF2_PROBES), reps)

    elif target == "ndp":
        from flink_parameter_server_spark.operators.dedup import (
            dedup_minhash_lsh,
            dedup_ngram_jaccard,
            dedup_simhash,
            dedup_substring_spans,
            hashed_shingles,
            token_hash_arrays,
        )
        from flink_parameter_server_spark.operators.similarity import (
            embedding_near_dup_pairs,
            embedding_semantic_pairs,
        )
        from flink_parameter_server_spark.scratch import scratch

        timed(spark, "token_hash_arrays (persist+count)", lambda: scratch(token_hash_arrays(spark, SF)), reps, lambda df: df.count())

        def with_tha(fn, **kw):
            tha = scratch(token_hash_arrays(spark, SF))
            return fn(spark, SF, tha=tha, **kw)

        def with_sh(fn):
            tha = scratch(token_hash_arrays(spark, SF))
            sh = scratch(hashed_shingles(spark, SF, tha=tha))
            return fn(spark, SF, sh=sh)

        timed(spark, "minhash_lsh (incl tha+sh)", lambda: with_sh(dedup_minhash_lsh), reps)
        timed(spark, "simhash (incl tha+sh)", lambda: with_sh(dedup_simhash), reps)
        timed(spark, "ngram (incl tha)", lambda: with_tha(dedup_ngram_jaccard, corpus_key=SF), reps)
        timed(spark, "substring (incl tha)", lambda: with_tha(dedup_substring_spans), reps)
        timed(spark, "embedding pairs", lambda: embedding_near_dup_pairs(spark, SF), reps)
        timed(spark, "semantic pairs", lambda: embedding_semantic_pairs(spark, SF), reps)

    elif target == "dcc":
        from flink_parameter_server_spark.operators._dedup_core import (
            star_connected_components,
        )
        from flink_parameter_server_spark.operators.dedup import dedup_minhash_lsh
        from flink_parameter_server_spark.operators.similarity import semdedup_prune

        timed(spark, "minhash pairs alone", lambda: dedup_minhash_lsh(spark, SF), reps)

        def cc():
            pairs = dedup_minhash_lsh(spark, SF).select(
                F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
            )
            parents, _ = star_connected_components(pairs)
            return parents

        timed(spark, "pairs + star CC", cc, reps)
        timed(spark, "semdedup_prune", lambda: semdedup_prune(spark, SF), reps)

    elif target == "copur":
        from flink_parameter_server_spark.operators._util import t
        from flink_parameter_server_spark.scratch import scratch

        li = t(spark, SF, "lineitem")
        orders = t(spark, SF, "orders")

        def cooc_full():
            baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
            return (
                baskets.select(F.explode("items").alias("item"), "items")
                .select("item", F.explode("items").alias("rec"))
                .where(F.col("item") != F.col("rec"))
                .groupBy("item", "rec")
                .agg(F.count(F.lit(1)).alias("w"))
            )

        timed(spark, "cooc_full agg", cooc_full, reps)

        def cust_items():
            return scratch(
                orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
                .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
                .distinct()
            )

        timed(spark, "cust_items distinct (count)", cust_items, reps, lambda df: df.count())
        from flink_parameter_server_spark.operators.recommend import copurchase_recommend_top5

        timed(spark, "full copurchase", lambda: copurchase_recommend_top5(spark, SF), reps)

    elif target == "tr":
        from flink_parameter_server_spark.operators.retrieval import (
            _bpe_words,
            _tf,
            bm25_search,
            bpe_merge_vocab,
            inverted_index,
            tfidf_top_terms,
        )
        from flink_parameter_server_spark.scratch import scratch

        timed(spark, "_tf build (persist+count)", lambda: scratch(_tf(spark, SF)), reps, lambda df: df.count())

        def with_tf(fn):
            tf = scratch(_tf(spark, SF))
            return fn(spark, SF, tf=tf)

        timed(spark, "tfidf (incl tf)", lambda: with_tf(tfidf_top_terms), reps)
        timed(spark, "bm25 (incl tf)", lambda: with_tf(bm25_search), reps)
        timed(spark, "inverted (incl tf)", lambda: with_tf(inverted_index), reps)
        timed(spark, "bpe_merge_vocab train", lambda: bpe_merge_vocab(spark, SF), reps)
        timed(spark, "bpe_words", lambda: _bpe_words(spark, SF), reps)

    else:
        print(f"unknown target {target}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
