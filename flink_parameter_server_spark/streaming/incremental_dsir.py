"""Continuous DSIR importance weighting against a persisted
feature-count store — the streaming form of operators/_dsir_core
(r10, completing the incremental family: lexical dedup r7, curation
r8, semantic dedup r9, importance weights here).

Why: a growing corpus wants per-doc importance weights AT INGEST TIME
(they gate selection/mixture decisions downstream), but the weight of
a doc depends on corpus-WIDE distributions — recomputing the batch
pipeline per micro-batch is a full rescan at 100 TB. State here is
tiny and mergeable: per-batch COUNT DELTAS over the DSIR_B hashed
feature buckets, written under ``counts/bid=<batch_id>`` (a replayed
batch overwrites its OWN delta — the decisions-dir idempotency
pattern of incremental_dedup). The lambda table is a DSIR_B-row
aggregate over the store, recomputed per batch — cost bounded by B,
never by corpus size.

Semantics (the greedy-stamp contract, the keep-first analog): a
batch's weights are computed under the distributions of all content
up to and INCLUDING the batch — so one batch over an empty store
reproduces the batch ``dsir_micro`` EXACTLY (pinned), and later
batches make earlier stamps stale. :func:`rescore_dsir` recomputes
any doc set under the CURRENT store, pinned equal to the batch
pipeline over the concatenated corpus. All arithmetic is the shared
``_dsir_core`` definition (integer micro-nats on the 6dp grid), so
engine-exactness carries over verbatim.

Contract: doc ids are unique across the catalog (store + all batches
share one id space, the semantic-store rule) — the count store tallies
token occurrences and TRUSTS upstream dedup, so re-ingesting the same
doc under a new batch id double-counts its tokens by design (run the
curation gates first; a replayed batch with the SAME bid is safe).

Scale shape: one (doc, b) shuffle per batch for the feature counts;
the store read is a B-row-per-batch-file aggregate (sum over deltas);
everything downstream is bounded broadcasts. Compaction is trivial if
ever needed (sum all deltas into one file) but the store grows by at
most DSIR_B rows per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators._dsir_core import (
    DSIR_B,
    DSIR_TARGET_LANG,
    dsir_features,
    dsir_lambda,
    dsir_weights,
)

_COUNTS_SCHEMA = "b bigint, cr bigint, ct bigint"


def read_dsir_counts(spark, store_dir: str) -> DataFrame:
    """Aggregated (b, cr, ct) over every batch delta in the store —
    empty-typed when nothing has been ingested yet."""
    path = os.path.join(store_dir, "counts")
    if os.path.isdir(path):
        return (
            spark.read.schema(_COUNTS_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(path)
            .groupBy("b")
            .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
        )
    return spark.createDataFrame([], _COUNTS_SCHEMA)


def process_dsir_batch(
    spark,
    docs: DataFrame,
    store_dir: str,
    batch_id: int,
    scratch_ids: set[int] | None = None,
) -> DataFrame:
    """Ingest one (doc_id, lang, text) batch: write its count delta
    under ``counts/bid=<batch_id>`` (overwrite — replay-idempotent),
    then return the batch docs' weights (doc_id, smic, ntok) computed
    against the store INCLUDING this batch.

    ``scratch_ids``: exact checkpoint attribution (the incremental
    family contract); when omitted, ids are tracked for
    ``scratch.release()``."""
    from ..scratch import scoped_checkpoint, track_checkpoint_ids

    own = scratch_ids is None
    ids: set[int] = set() if own else scratch_ids
    # the feature counts feed the delta write AND the weight sums —
    # checkpoint once so the (doc, b) shuffle runs once
    fcnt = scoped_checkpoint(dsir_features(docs), ids)
    if own:
        track_checkpoint_ids(spark, ids)
    delta = fcnt.groupBy("b").agg(
        F.sum("n").cast("long").alias("cr"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("n"))).cast("long").alias("ct"),
    )
    delta.select(
        "b", "cr", F.coalesce("ct", F.lit(0)).cast("long").alias("ct")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, "counts", f"bid={batch_id}")
    )
    counts = read_dsir_counts(spark, store_dir)
    lam = dsir_lambda(
        counts.select("b", "cr"), counts.where(F.col("ct") > 0).select("b", "ct")
    )
    return dsir_weights(fcnt, lam)


def rescore_dsir(spark, docs: DataFrame, store_dir: str) -> DataFrame:
    """(doc_id, smic, ntok) for ``docs`` under the CURRENT store state
    — after all batches are in, this equals the batch pipeline over
    the concatenated corpus (pinned). Use it to refresh stale early
    stamps before a selection pass."""
    counts = read_dsir_counts(spark, store_dir)
    lam = dsir_lambda(
        counts.select("b", "cr"), counts.where(F.col("ct") > 0).select("b", "ct")
    )
    return dsir_weights(dsir_features(docs), lam)


def dsir_stream_writer(spark, docs_stream: DataFrame, store_dir: str, weights_dir: str):
    """Wire :func:`process_dsir_batch` into Structured Streaming:
    foreachBatch updates the count store and writes the batch's
    weights to ``weights_dir`` under ``bid=<batch_id>`` (overwrite —
    one stamp per doc per batch, replay replaces itself). Returns the
    started StreamingQuery."""

    def _sink(batch_df, batch_id: int) -> None:
        from ..scratch import unpersist_rdd_ids

        ids: set[int] = set()
        process_dsir_batch(
            spark, batch_df, store_dir, batch_id, scratch_ids=ids
        ).withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            os.path.join(weights_dir, f"bid={batch_id}")
        )
        unpersist_rdd_ids(spark, ids)

    return (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(store_dir, "_checkpoint"))
        .start()
    )
