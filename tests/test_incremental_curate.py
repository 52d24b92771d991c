"""Streaming corpus curation (streaming/incremental_curate.py).

Pins: (1) one-batch stage semantics and precedence on an engineered
corpus firing every stage; (2) cross-batch greedy keep-first — later
exact/near duplicates of ACCEPTED content are rejected against the
store with provenance; (3) at-least-once replay idempotency for the
hash store; (4) the foreachBatch wire-up carries state across
micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_parameter_server_spark.streaming.incremental_curate import (
    curate_batch,
    curate_stream_writer,
)
from flink_parameter_server_spark.streaming.incremental_dedup import (
    build_signature_store,
)

BODY = " ".join(f"tok{i} word{i % 7} filler{i % 11}" for i in range(30))
OTHER = " ".join(f"zz{i} yy{i * 3} xx{i % 5}" for i in range(30))
EVAL = " ".join(f"ev{i} bench{i % 5} item{i % 9}" for i in range(30))


def _mkdocs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("n_chars", F.coalesce(F.length("text"), F.lit(0)))


def test_single_batch_stage_semantics(spark, tmp_path):
    store = str(tmp_path / "store")
    eval_store = str(tmp_path / "eval")
    build_signature_store(spark, _mkdocs(spark, [(900, EVAL)]).select("doc_id", "text"), eval_store)

    batch = _mkdocs(
        spark,
        [
            (1, BODY),                  # accepted
            (2, BODY),                  # exact dup of 1 (in batch)
            (3, BODY + " tail"),        # near dup of 1 (in batch CC)
            (4, "short"),               # quality reject
            (5, EVAL + " suffix"),      # contaminated vs eval store
            (6, OTHER),                 # accepted
        ],
    )
    got = {
        r["doc_id"]: (r["decision"], r["dup_of"])
        for r in curate_batch(spark, batch, store, eval_store).collect()
    }
    assert got[1] == ("accepted", None)
    assert got[2] == ("rejected:exact_dup", 1)
    assert got[3] == ("rejected:near_dup", 1)
    assert got[4] == ("rejected:quality", None)
    assert got[5] == ("rejected:contaminated", 900)
    assert got[6] == ("accepted", None)
    # store state: accepted docs' hashes + signatures only
    hs = {r["doc_id"] for r in spark.read.parquet(os.path.join(store, "hashes")).collect()}
    assert hs == {1, 6}
    sh = {r["doc_id"] for r in spark.read.parquet(os.path.join(store, "shingles")).collect()}
    assert sh == {1, 6}
    # eval store untouched (read-only probe)
    assert spark.read.parquet(os.path.join(eval_store, "shingles")).count() == 1


def test_cross_batch_store_rejections_and_replay(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = _mkdocs(spark, [(1, BODY), (2, OTHER)])
    d1 = {r["doc_id"]: r["decision"] for r in curate_batch(spark, b1, store).collect()}
    assert d1 == {1: "accepted", 2: "accepted"}

    # batch 2: 10 = verbatim copy of stored 1 -> exact store reject;
    # 11 = near-dup of stored 2 -> near_dup; 12 fresh
    b2 = _mkdocs(spark, [(10, BODY), (11, OTHER + " more"), (12, " ".join(f"q{i}w{i}" for i in range(30)))])
    d2 = {
        r["doc_id"]: (r["decision"], r["dup_of"])
        for r in curate_batch(spark, b2, store).collect()
    }
    assert d2[10] == ("rejected:exact_dup_store", 1)
    assert d2[11] == ("rejected:near_dup", 2)
    assert d2[12] == ("accepted", None)

    # replay batch 2: same decisions, no store growth
    n_h = spark.read.parquet(os.path.join(store, "hashes")).count()
    n_sh = spark.read.parquet(os.path.join(store, "shingles")).count()
    d2r = {
        r["doc_id"]: (r["decision"], r["dup_of"])
        for r in curate_batch(spark, b2, store).collect()
    }
    assert d2r == d2
    assert spark.read.parquet(os.path.join(store, "hashes")).count() == n_h
    assert spark.read.parquet(os.path.join(store, "shingles")).count() == n_sh


def test_streaming_wireup_carries_state(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    decisions = str(tmp_path / "decisions")
    _mkdocs(spark, [(1, BODY)]).coalesce(1).write.parquet(f"{src}/f1")
    _mkdocs(spark, [(2, BODY)]).coalesce(1).write.parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string, n_chars int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_stream_writer(spark, stream, store, decisions)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dec = {r["doc_id"]: r["decision"] for r in spark.read.parquet(decisions).collect()}
    # lexicographic file order: 1 accepted, 2 exact-rejected vs the store
    assert dec == {1: "accepted", 2: "rejected:exact_dup_store"}
    assert spark.read.parquet(decisions).select("batch_id").distinct().count() == 2
