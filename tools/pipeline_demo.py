#!/usr/bin/env python
"""End-to-end LLM-training-data pipeline demo — one runnable artifact
composing the engine's data-prep surface into the journey a real
pretraining corpus takes, on the driver fixture:

  1. curate      — quality gate -> exact dedup -> eval decontamination
                   -> near-dup canonical -> stratified split
                   (operators/curate.py, the oracle-checked pipeline)
  1b. clean      — within-document repetition removal (r10): the
                   Gopher/RefinedWeb duplicate-line dedup + token-run
                   collapse transforms (textstats.dedup_lines /
                   collapse_runs), map-only over the corpus
  2. pack        — token-budget training packs over the curated TRAIN
                   docs (mlprep's packed mechanics)
  3. mix         — sqrt-scaled language upsampling plan (mixture),
                   plus the late-r9 mixture-planning surfaces: the
                   DSIR-derived domain reweighting plan
                   (domain_reweight) and the semantic-cell balancing
                   caps (cluster_balance)
  4. tokenize    — train a BPE merge vocabulary on the curated corpus,
                   then tokenize under the LEARNED merges (retrieval.py
                   bpe_merge_vocab + bpe_apply)
  5. score       — model-based quality scores (PA-trained on weak
                   labels, ps/pa.py doc_quality_filter) and the
                   bigram-LM cross-entropy signal (text_profile)
  5b. embed+select — SemDeDup semantic-dup pruning over the vector
                   catalog (similarity.semdedup_prune) on all three
                   geometries (counted-n, fixed-k sampled k-means,
                   r11 deterministic two-level), DSIR importance
                   selection of the train split by dsir_logw
                   (text_profile, r9), and the r11 seeded-Gumbel
                   temperature>0 selection next to the hard cut
  6. ingest      — the CONTINUOUS form (r9): publish the corpus onto an
                   fpsqueue topic (sources/fps_queue.py), stream it
                   back in rate-limited micro-batches, and run the same
                   curation per batch against persisted stores
                   (streaming/incremental_curate.curate_stream_writer,
                   incl. the r9 semantic stage against a persisted
                   vector store) — batch and streamed curation in one
                   invocation; 6b (r10) stamps the same corpus through
                   the continuous DSIR count store and checks the
                   final rescore against the batch weight pipeline;
                   6c (r11) compacts the count store and replays a
                   folded bid to surface the compaction replay
                   contract; 6d (late r11) streams the corpus through
                   the continuous ExactSubstr span store in two
                   in-order batches and checks the cuts against the
                   whole-corpus batch removal.

Prints one human-readable summary per stage plus a final JSON line.

Usage: python tools/pipeline_demo.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if args and args[0] == "--sf":
        sf = args[1]

    from flink_parameter_server_spark.operators.curate import corpus_curate
    from flink_parameter_server_spark.operators.retrieval import (
        bpe_apply,
        bpe_merge_vocab,
    )
    from flink_parameter_server_spark.plans import REGISTRY
    from flink_parameter_server_spark.ps.pa import doc_quality_filter
    from flink_parameter_server_spark.session import get_spark

    spark = get_spark("fps-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    out: dict = {"sf_dir": sf}

    # 1. curate — since r13 the flagship gate APPLIES the published
    # Gopher Table A1 thresholds (fixture rule set; labels show which
    # rule rejected each doc)
    from flink_parameter_server_spark.operators._gopher_core import (
        GOPHER_FIXTURE_RULES,
    )

    decisions = corpus_curate(
        spark, sf, quality_rules=GOPHER_FIXTURE_RULES
    ).cache()
    by_decision = {
        r["split"]: r["n"]
        for r in decisions.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out["curate"] = by_decision
    print(f"# curate: {by_decision}")

    # 1b. clean — within-document repetition removal (r10): the
    # Gopher/RefinedWeb transform (duplicate-line dedup + consecutive
    # token-run collapse) applied map-only over the corpus; a real
    # pipeline rewrites text here before tokenization, the profile
    # entry carries the same columns oracle-checked
    from flink_parameter_server_spark.functions.text import tokens
    from flink_parameter_server_spark.operators._util import t as _t
    from flink_parameter_server_spark.operators.textstats import (
        collapse_runs,
        dedup_lines,
        redact_pii,
    )

    from flink_parameter_server_spark.functions.hashing import poly_hash
    from flink_parameter_server_spark.operators._dedup_core import (
        span_removal_positions,
    )

    _dl_text, _dl_n = dedup_lines(F.col("text"))
    _dp_text, _dp_n = dedup_lines(F.col("text"), sep="\n\n")
    _cr_text, _cr_n = collapse_runs(tokens(F.col("text")))
    cleaned = _t(spark, sf, "documents").select(
        "doc_id",
        _dl_n.alias("ln"),
        _dp_n.alias("pn"),
        _cr_n.alias("rn"),
        (redact_pii(F.col("text")) != F.col("text")).cast("long").alias("red"),
    )
    # corpus-wide ExactSubstr removal (late r11): duplicated 8-token
    # spans cut everywhere but their global canonical occurrence
    srp = span_removal_positions(
        _t(spark, sf, "documents").select(
            "doc_id",
            F.transform(tokens(F.col("text")), lambda s_: poly_hash(s_, 0)).alias(
                "th"
            ),
        )
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_occ").alias("occ"),
        F.sum(F.size("dpos")).alias("toks"),
    ).first()
    cagg = cleaned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ln").alias("l"),
        F.sum("pn").alias("p"),
        F.sum("rn").alias("r"),
        F.sum((F.col("rn") > 0).cast("long")).alias("docs_hit"),
        F.sum("red").alias("redacted"),
    ).first()
    out["clean"] = {
        "docs": cagg["n"],
        "dup_lines_removed": int(cagg["l"] or 0),
        "dup_paras_removed": int(cagg["p"] or 0),
        "run_tokens_removed": int(cagg["r"] or 0),
        "docs_with_runs": int(cagg["docs_hit"] or 0),
        "docs_pii_redacted": int(cagg["redacted"] or 0),
        "substr_docs_edited": int(srp["docs"] or 0),
        "substr_span_occurrences_cut": int(srp["occ"] or 0),
        "substr_tokens_removed": int(srp["toks"] or 0),
    }
    print(f"# clean (repetition removal): {out['clean']}")

    # 2+3. pack + mix (the registered split entry carries both parts)
    split_parts = REGISTRY["train_test_split"].fn(spark, sf)
    packs = (
        split_parts.where("part = 'packed'")
        .select("split")
        .distinct()
        .count()
    )
    mix = {
        r["split"]: r["n"]
        for r in split_parts.where("part = 'mixture'")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["packed_pack_count"] = packs
    out["mixture_copies"] = mix
    # r11: the HARD-CAP form next to the overflow form — every pack
    # fits the context window whole (FFD per shard); utilization =
    # packed tokens / (packs x budget) over non-oversize packs
    from flink_parameter_server_spark.operators.mlprep import (
        PACK_BUDGET,
        pack_tokens_capped,
    )

    capped = pack_tokens_capped(_t(spark, sf, "documents")).where(~F.col("oversize"))
    cstats = capped.groupBy("shard", "pack_id").agg(
        F.sum("tok").alias("t")
    ).agg(F.count(F.lit(1)).alias("n_packs"), F.sum("t").alias("tok")).collect()[0]
    out["packed_capped"] = {
        "packs": cstats["n_packs"],
        "utilization": round(cstats["tok"] / (cstats["n_packs"] * PACK_BUDGET), 3),
    }
    print(f"# pack: {packs} token-budget packs; capped: {out['packed_capped']}; mix: {mix}")

    # 3b. mixture planning (late r9): importance-weighted DOMAIN
    # mixture (DoReMi shape over the shared DSIR weights) and
    # semantic-cell balancing caps (MetaCLIP shape) — the two
    # whole-corpus sampling plans a mixture designer reads before
    # committing token budgets
    dom = {
        r["split"]: r["n"]
        for r in split_parts.where("part = 'domain_reweight'")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    clus = {
        r["split"]: r["n"]
        for r in split_parts.where("part = 'cluster_balance'")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["domain_reweight"] = dom
    out["cluster_balance"] = clus
    print(f"# plan: domain_reweight {dom}; cluster_balance {clus}")

    # 3c. iterate the reweight plan (r10): the real DoReMi EG loop —
    # per-round excess recomputed against the current rate-weighted
    # mixture, so the printed per-round rate series converges (on the
    # homogeneous fixture sources the rates sit ~1 from round 1; the
    # synthetic two-source receipt lives in BASELINE.md)
    from flink_parameter_server_spark.operators.mlprep import (
        domain_reweight_iterated,
    )

    series: dict = {}
    for r in domain_reweight_iterated(spark, sf, rounds=3).collect():
        series.setdefault(r["round"], {})[r["source"]] = round(r["r"], 4)
    out["domain_reweight_rounds"] = {str(k): series[k] for k in sorted(series)}
    print(f"# plan (iterated DoReMi): {out['domain_reweight_rounds']}")

    # 4. tokenize: train merges on the corpus, apply to the train docs
    merges_df = bpe_merge_vocab(spark, sf)
    merges = [
        (r["a"], r["b"]) for r in merges_df.orderBy("rank").collect() if r["a"]
    ]
    out["bpe_merges"] = ["".join(p) for p in merges]
    train_ids = decisions.where("split = 'train'").select("doc_id")
    from flink_parameter_server_spark.operators._util import t as _t
    from flink_parameter_server_spark.functions.text import tokens

    train_words = (
        _t(spark, sf, "documents")
        .join(train_ids, "doc_id", "left_semi")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    )
    tok = bpe_apply(train_words, merges)
    stats = tok.agg(
        F.count(F.lit(1)).alias("words"),
        F.sum("n_subwords").alias("subwords"),
    ).collect()[0]
    out["tokenize"] = {
        "train_words": stats["words"],
        "subwords_under_learned_vocab": stats["subwords"],
        "compression": round(stats["subwords"] / max(1, stats["words"]), 3),
    }
    print(f"# tokenize: {out['tokenize']}")

    # 5. score: learned quality model + LM signal over the train split
    dq = doc_quality_filter(spark, sf).cache()
    agree = dq.where("y = y_pred").count() / max(1, dq.count())
    prof = REGISTRY["text_profile"].fn(spark, sf).cache()
    lm = (
        prof.join(train_ids, "doc_id", "left_semi")
        .agg(
            F.round(F.avg("lm_xent"), 3).alias("mean_xent"),
            F.round(F.max("lm_xent"), 3).alias("max_xent"),
        )
        .collect()[0]
    )
    out["score"] = {
        "quality_model_weak_label_agreement": round(agree, 3),
        "train_mean_lm_xent": lm["mean_xent"],
        "train_max_lm_xent": lm["max_xent"],
    }
    print(f"# score: {out['score']}")

    # 5a. Gopher Table A1 gates (r12): how many docs each published
    # threshold would reject on this corpus — the repetition fractions
    # (top-n-gram / dup-n-gram char coverage) and the quality rules,
    # all read from the same oracle-checked profile scan
    gates = {
        "top_2gram_char_frac > 0.20": "top_2gram_char_frac > 0.20",
        "top_3gram_char_frac > 0.18": "top_3gram_char_frac > 0.18",
        "top_4gram_char_frac > 0.16": "top_4gram_char_frac > 0.16",
        "dup_5gram_char_frac > 0.15": "dup_5gram_char_frac > 0.15",
        "dup_10gram_char_frac > 0.10": "dup_10gram_char_frac > 0.10",
        "symbol_word_ratio > 0.1": "symbol_word_ratio > 0.1",
        "bullet_line_frac > 0.9": "bullet_line_frac > 0.9",
        "ellipsis_line_frac > 0.3": "ellipsis_line_frac > 0.3",
        "alpha_word_frac < 0.8": "alpha_word_frac < 0.8",
    }
    grow = prof.agg(
        *[
            F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(f"g{i}")
            for i, cond in enumerate(gates.values())
        ]
    ).first()
    out["gopher_gates"] = {
        label: int(grow[f"g{i}"] or 0) for i, label in enumerate(gates)
    }
    print(f"# gopher gates (docs tripped): {out['gopher_gates']}")

    # 5b. embedding-space prune + importance selection (r9): SemDeDup
    #     drops semantic duplicates from the vector catalog (keep the
    #     least-central member per duplicate component), and DSIR
    #     importance-resamples the train split toward the target
    #     distribution (top half by dsir_logw)
    from flink_parameter_server_spark.operators.ann_index import kmeans_assign
    from flink_parameter_server_spark.operators.similarity import (
        embeddings_normed,
        semdedup_prune,
    )
    from flink_parameter_server_spark.scratch import release, scratch

    pr = semdedup_prune(spark, sf)
    sem_dropped = pr.where("keep = 0").count()
    # the same prune on the fixed-k sampled-k-means geometry (the
    # 100 TB form, r10) — k ~ sqrt(n) per the BASELINE.md sizing
    emb_n = embeddings_normed(spark, sf)
    k_fk = max(16, int(emb_n.count() ** 0.5))
    assign_fk = scratch(
        kmeans_assign(spark, emb_n, n_cells=k_fk, keep_centroid_cos=True)
    )
    sem_dropped_fk = (
        semdedup_prune(spark, sf, assign=assign_fk).where("keep = 0").count()
    )
    release()
    train_w = prof.join(train_ids, "doc_id", "left_semi").where(
        F.col("dsir_logw").isNotNull()
    )
    n_train_w = train_w.count()
    sel = train_w.orderBy(F.col("dsir_logw").desc()).limit(n_train_w // 2)
    stats = sel.agg(F.round(F.avg("dsir_logw"), 3).alias("sel_mean")).collect()[0]
    all_mean = train_w.agg(F.round(F.avg("dsir_logw"), 3).alias("m")).collect()[0]["m"]
    # r11: the same prune on the deterministic two-level (ivf2) cells,
    # and the temperature>0 seeded-Gumbel selection next to the hard cut
    from flink_parameter_server_spark.operators._dsir_core import dsir_micro
    from flink_parameter_server_spark.operators.mlprep import dsir_select_gumbel
    from flink_parameter_server_spark.operators.similarity import ivf2_assign

    assign_2l = scratch(
        ivf2_assign(emb_n, keep_centroid_cos=True).where(F.col("ne") > 0)
    )
    sem_dropped_2l = (
        semdedup_prune(spark, sf, assign=assign_2l).where("keep = 0").count()
    )
    release()
    w_all = dsir_micro(_t(spark, sf, "documents").select("doc_id", "lang", "text"))
    gum = dsir_select_gumbel(w_all.join(train_ids, "doc_id", "left_semi"))
    n_gum = gum.where("sel = 'selected'").count()
    # r11: the geometry-picker diagnostic — max_share > ~0.1 would say
    # "switch this corpus's semantic stage to the kmeans quantizer"
    from flink_parameter_server_spark.operators.similarity import (
        ivf_assign,
        semantic_cell_profile,
    )

    prof_cells = semantic_cell_profile(ivf_assign(embeddings_normed(spark, sf)))
    out["embed_select"] = {
        "cell_profile": {
            "n_cells": prof_cells["n_cells"],
            "max_share": round(prof_cells["max_share"], 3),
            "pair_bound": prof_cells["pair_bound"],
        },
        "semantic_dups_dropped": sem_dropped,
        "semantic_dups_dropped_fixedk": sem_dropped_fk,
        "semantic_dups_dropped_two_level": sem_dropped_2l,
        "dsir_selected": n_train_w // 2,
        "dsir_selected_mean_logw": stats["sel_mean"],
        "dsir_train_mean_logw": all_mean,
        "dsir_gumbel_selected": n_gum,
    }
    print(f"# embed+select: {out['embed_select']}")

    # 5c. persisted IVFADC serving probe (r12): the index a serving
    #     deployment would hold — pq=True build, ADC probe over the
    #     4-byte codes replica, lossless at covering shortlist
    import tempfile as _tf

    from flink_parameter_server_spark.operators.ann_index import (
        build_ivf_index,
        ivf_search,
    )

    idxdir = _tf.mkdtemp(prefix="ivfpq_demo_")
    try:
        build_ivf_index(
            spark, _t(spark, sf, "embeddings"), idxdir, n_cells=16, iters=2, pq=True
        )
        qs = (
            _t(spark, sf, "embeddings")
            .where(F.col("vec_id") % 50 == 0)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        )
        exact = {
            (r["query_id"], r["rk"]): r["neighbor_id"]
            for r in ivf_search(spark, idxdir, qs, k=5, n_probe=2).collect()
        }
        adc = {
            (r["query_id"], r["rk"]): r["neighbor_id"]
            for r in ivf_search(
                spark, idxdir, qs, k=5, n_probe=2, adc=True, shortlist=16
            ).collect()
        }
        agree = sum(1 for kk, v in adc.items() if exact.get(kk) == v)
        out["ivfpq_probe"] = {
            "topk_slots": len(exact),
            "adc_shortlist16_agreement": round(agree / max(1, len(exact)), 3),
        }
        print(f"# ivfpq serving probe: {out['ivfpq_probe']}")
    finally:
        import shutil as _sh

        _sh.rmtree(idxdir, ignore_errors=True)

    # 6. ingest (streamed): the same corpus arriving as a topic — the
    #    continuous-ingestion form of stage 1, through the native
    #    fpsqueue source and the per-micro-batch curation writer
    import shutil
    import tempfile

    from flink_parameter_server_spark.operators.curate import is_eval_holdout
    from flink_parameter_server_spark.sources.fps_queue import register as register_fpsq
    from flink_parameter_server_spark.streaming.incremental_curate import (
        curate_stream_writer,
    )
    from flink_parameter_server_spark.streaming.incremental_dedup import (
        build_signature_store,
    )

    register_fpsq(spark)
    work = tempfile.mkdtemp(prefix="fps_demo_")
    try:
        docs = _t(spark, sf, "documents").select("doc_id", "text", "n_chars")
        # the seeded eval holdout plays the benchmark set, as in stage 1
        build_signature_store(
            spark,
            docs.where(is_eval_holdout()).select("doc_id", "text"),
            os.path.join(work, "eval_store"),
        )
        # r9: the streamed leg also runs the SEMANTIC stage — seed the
        # vector store with the batch pipeline's stride geometry
        from flink_parameter_server_spark.streaming.semantic_dedup import (
            build_semantic_store,
        )

        emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        build_semantic_store(spark, emb, os.path.join(work, "sem_store"))
        # produce: the incoming corpus lands as 4 arrival-ordered
        # topic messages (the batch producer half of the source)
        topic = os.path.join(work, "topic")
        docs.where(~is_eval_holdout()).repartition(4).write.format(
            "fpsqueue"
        ).option("path", topic).mode("append").save()
        # consume: rate-limited micro-batches -> curate -> stores
        stream = (
            spark.readStream.format("fpsqueue")
            .option("path", topic)
            .option("ddl", "doc_id bigint, text string, n_chars bigint")
            .option("maxFilesPerBatch", "2")
            .load()
        )
        q = curate_stream_writer(
            spark,
            stream,
            os.path.join(work, "store"),
            os.path.join(work, "decisions"),
            os.path.join(work, "eval_store"),
            emb=emb,
            semantic_store_dir=os.path.join(work, "sem_store"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        dec = spark.read.parquet(os.path.join(work, "decisions"))
        stream_counts = {
            r["decision"]: r["n"]
            for r in dec.groupBy("decision").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        out["ingest_streamed"] = {
            "micro_batches": dec.select("batch_id").distinct().count(),
            "decisions": stream_counts,
        }
        # batch-vs-streamed consistency note: accepted should track the
        # batch pipeline's train+valid+test survivor count (greedy
        # cross-batch keep-first can differ from whole-corpus CC only
        # on transitive near-dup chains split across micro-batches)
        batch_survivors = sum(by_decision.get(k, 0) for k in ("train", "valid", "test"))
        out["ingest_streamed"]["batch_pipeline_survivors"] = batch_survivors
        print(f"# ingest (streamed): {out['ingest_streamed']}")

        # 6b. continuous importance weights (r10): the same two
        # micro-batches stamped by the incremental DSIR store; the
        # final rescore must agree with the batch weight pipeline
        # (pinned in tests — here just surfaced)
        from flink_parameter_server_spark.operators._dsir_core import dsir_micro
        from flink_parameter_server_spark.streaming.incremental_dsir import (
            process_dsir_batch,
            rescore_dsir,
        )

        dsir_store = os.path.join(work, "dsir_store")
        dsrc = _t(spark, sf, "documents").select("doc_id", "lang", "text")
        halves = [
            dsrc.where(F.col("doc_id") % 2 == 0),
            dsrc.where(F.col("doc_id") % 2 == 1),
        ]
        stamped = 0
        for bid, half in enumerate(halves):
            stamped += process_dsir_batch(spark, half, dsir_store, bid).count()
        refreshed = rescore_dsir(spark, dsrc, dsir_store)
        agree = refreshed.join(
            dsir_micro(dsrc).withColumnRenamed("smic", "smic_batch"),
            "doc_id",
        )
        n_agree = agree.where(F.col("smic") == F.col("smic_batch")).count()
        out["ingest_dsir"] = {
            "stamped": stamped,
            "rescore_equals_batch_pipeline": n_agree == refreshed.count(),
        }
        print(f"# ingest (continuous DSIR): {out['ingest_dsir']}")

        # 6c (r11): compact the count store, then REPLAY a folded bid —
        # counts stay stable because the folded-bid set makes the
        # replay skip its delta write (the compaction replay contract)
        from flink_parameter_server_spark.streaming.incremental_dsir import (
            compact_dsir_counts,
            read_dsir_counts,
        )

        before_c = {
            r["b"]: (r["cr"], r["ct"])
            for r in read_dsir_counts(spark, dsir_store).collect()
        }
        folded = compact_dsir_counts(spark, dsir_store)
        process_dsir_batch(spark, halves[0], dsir_store, 0).count()
        after_c = {
            r["b"]: (r["cr"], r["ct"])
            for r in read_dsir_counts(spark, dsir_store).collect()
        }
        out["ingest_dsir_compaction"] = {
            "bids_folded": folded,
            "counts_stable_after_folded_replay": after_c == before_c,
        }
        print(f"# ingest (DSIR compaction): {out['ingest_dsir_compaction']}")

        # 6d (late r11): the same corpus through the CONTINUOUS
        # ExactSubstr span store in two in-doc_id-order batches — the
        # streamed cuts must equal the whole-corpus batch removal
        from flink_parameter_server_spark.operators._dedup_core import (
            span_removal_positions,
            token_hashes,
        )
        from flink_parameter_server_spark.streaming.incremental_substr import (
            process_substr_batch,
        )

        sdocs = docs.select("doc_id", "text")
        mid = sdocs.agg(
            F.percentile_approx("doc_id", 0.5).alias("m")
        ).first()["m"]
        store = os.path.join(work, "span_store")
        cuts = {}
        for bid, half in enumerate(
            (sdocs.where(F.col("doc_id") <= mid), sdocs.where(F.col("doc_id") > mid))
        ):
            for r in process_substr_batch(spark, half, store, bid).collect():
                cuts[r["doc_id"]] = (frozenset(r["dpos"]), r["n_occ"])
        batch_cuts = {
            r["doc_id"]: (frozenset(r["dpos"]), r["n_occ"])
            for r in span_removal_positions(token_hashes(sdocs)).collect()
        }
        out["ingest_substr"] = {
            "batches": 2,
            "docs_edited_streamed": len(cuts),
            "streamed_equals_batch_removal": cuts == batch_cuts,
        }
        print(f"# ingest (continuous substr removal): {out['ingest_substr']}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
