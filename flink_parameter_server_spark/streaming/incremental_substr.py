"""Continuous ExactSubstr span removal against a persisted span store
— the streaming form of the Lee et al. 2022 removal transform
(operators/_dedup_core.span_removal_positions is the batch half; this
module is its continuous-ingestion dual, the same relationship
incremental_dedup.py has to dedup_cluster_canonical).

State = ONE append-only parquet table under ``store_dir``:

- ``spans/bid=<batch_id>/`` — the DISTINCT span hashes whose canonical
  occurrence has been accepted so far, one partition per ingested
  batch (the incremental_dsir delta layout). A replayed batch
  OVERWRITES its own partition, so at-least-once delivery cannot
  double-insert; and the probe reads ``bid != current`` so a replay
  sees exactly the pre-batch store state — its decisions are
  bit-identical to the original run (the incremental_dedup self-guard,
  re-cast for spans). :func:`compact_span_store` folds all deltas
  (and any prior compact file) into ``spans/compact`` with the folded
  bid set persisted at ``spans/_folded`` — probe-identical before and
  after, replay of a folded bid skips its append (contract in the
  function docstring).

Per batch (:func:`process_substr_batch`):

1. token-hash the batch with the shared batch arithmetic
   (token_hashes -> span_occurrences — bit-identical span hashes, so
   streamed and batch removal agree by construction);
2. within-batch canonical pick: row_number over (sp) ordered by
   (doc_id, s) — rank 1 is the batch-local first occurrence;
3. store probe: a span already in the store (any earlier batch) has
   its canonical THERE, so every occurrence here is cut; otherwise
   rank >= 2 occurrences are cut and rank 1 survives;
4. the surviving rank-1 spans append to the store under this bid.

Semantics vs batch ``span_removal_positions`` — greedy keep-first by
ARRIVAL: the canonical occurrence is the first one ever ingested, so
when batches arrive in ascending doc_id order the streamed cuts equal
the batch run over the concatenated corpus EXACTLY (pinned); out of
order, the canonical is the earlier ARRIVAL rather than the smaller
doc_id — the standard streaming contract (a doc's cut positions never
change retroactively), same as the incremental dedup store's
keep-first. Doc ids must be unique across the corpus (one id space for
store + batches).

Scale shape: per batch, one map-only span build over batch tokens, one
row_number shuffle on sp (batch-sized), one equi-join against the
store span table (spark equi-join; the store side is distinct span
hashes of accepted content — AQE broadcasts it while it fits, then
degrades to a shuffled hash join), one append. No step depends on
batch count; the store grows only with distinct accepted spans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators._dedup_core import (
    SPAN_K,
    merge_cut_runs,
    span_occurrences,
    token_hashes,
)

_SPANS_SCHEMA = "sp bigint"
_FOLDED_SCHEMA = "bid bigint"


def _delta_paths(spark, spans_path: str, exclude_bid: int | None) -> list[str]:
    from ..sources.fsutil import list_dir_names

    return [
        os.path.join(spans_path, n)
        for n in list_dir_names(spark, spans_path)
        if n.startswith("bid=")
        and (exclude_bid is None or n != f"bid={exclude_bid}")
    ]


def store_spans(spark, store_dir: str, exclude_bid: int | None = None) -> DataFrame:
    """The distinct accepted span hashes — optionally excluding one
    bid's partition (the replay self-guard: a probe must not see the
    spans its own failed attempt wrote). Reads an explicit path list
    (per-bid delta dirs + the compact file) rather than hive partition
    discovery, so the post-compaction mixed layout stays readable."""
    from ..sources.fsutil import path_exists

    path = os.path.join(store_dir, "spans")
    if not path_exists(spark, path):
        return spark.createDataFrame([], _SPANS_SCHEMA)
    paths = _delta_paths(spark, path, exclude_bid)
    compact = os.path.join(path, "compact")
    if path_exists(spark, compact):
        paths.append(compact)
    if not paths:
        return spark.createDataFrame([], _SPANS_SCHEMA)
    return spark.read.schema(_SPANS_SCHEMA).parquet(*paths).select("sp").distinct()


def folded_span_bids(spark, store_dir: str) -> set[int]:
    """Batch ids folded into the compact file by
    :func:`compact_span_store` (the incremental_dsir._folded pattern —
    a tiny parquet, one bigint per ever-ingested bid)."""
    from ..sources.fsutil import path_exists

    path = os.path.join(store_dir, "spans", "_folded")
    if path_exists(spark, path):
        return {
            r["bid"]
            for r in spark.read.schema(_FOLDED_SCHEMA).parquet(path).collect()
        }
    return set()


def compact_span_store(spark, store_dir: str) -> int:
    """Fold every per-batch span delta (and any previous compact file)
    into ONE distinct-span file — the many-small-files fix for a
    long-lived store (the compact_dsir_counts pattern; folding is a
    set union, so the probe result is identical before and after —
    pinned in tests). Returns the number of bid deltas folded.

    Replay contract: a bid in the folded set SKIPS its append on
    replay (the compact file already carries its spans), so the store
    never double-inserts. Its replayed DECISIONS, however, are
    computed against a store that already contains its own spans (the
    exclude-own-bid guard has nothing to exclude once the partition is
    folded) — so compaction must only run once every folded batch's
    decisions are durably stamped, the same single-writer
    between-batches discipline as the DSIR store. All filesystem ops
    route through the Hadoop FS API (fsutil)."""
    from ..sources.fsutil import delete_path, path_exists, rename_path

    spans_path = os.path.join(store_dir, "spans")
    if not path_exists(spark, spans_path):
        return 0  # never-ingested store: nothing to fold
    folded = folded_span_bids(spark, store_dir)
    new_paths = _delta_paths(spark, spans_path, None)
    all_paths = list(new_paths)
    compact = os.path.join(spans_path, "compact")
    if path_exists(spark, compact):
        all_paths.append(compact)
    if not all_paths:
        return 0
    merged = spark.read.schema(_SPANS_SCHEMA).parquet(*all_paths).select("sp").distinct()
    new_bids = {int(p.rsplit("bid=", 1)[1]) for p in new_paths}
    tmp = spans_path + "_compacting"
    merged.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "compact"))
    spark.createDataFrame(
        [(int(b),) for b in sorted(folded | new_bids)], _FOLDED_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "_folded"))
    delete_path(spark, spans_path)
    rename_path(spark, tmp, spans_path)
    return len(new_bids)


def process_substr_batch(
    spark, docs: DataFrame, store_dir: str, batch_id: int
) -> DataFrame:
    """Cut duplicate spans from one (doc_id, text) batch against the
    store, then persist the batch's new canonical spans under
    ``bid=<batch_id>``. Returns (doc_id, dpos array<int>, n_occ) for
    docs with at least one cut (callers left-join, exactly the batch
    function's contract). The returned frame is computed EAGERLY
    (checkpointed) before the store append so the decisions a caller
    stamps are the ones made against the pre-append state."""
    from ..scratch import tracked_checkpoint

    th = token_hashes(docs.select("doc_id", "text"))
    occ = span_occurrences(th)
    w = Window.partitionBy("sp").orderBy("doc_id", "s")
    ranked = occ.withColumn("rn", F.row_number().over(w))
    seen = store_spans(spark, store_dir, exclude_bid=batch_id)
    probed = tracked_checkpoint(
        ranked.join(seen.withColumn("_seen", F.lit(1)), "sp", "left")
    )
    cut = probed.where((F.col("rn") >= 2) | F.col("_seen").isNotNull())
    # same maximal-run merge as the batch half (r12, merge_cut_runs):
    # sub-span kept fragments between a doc's cut runs are filled, so
    # the single-batch ≡ batch pin keeps holding position-for-position
    decisions = tracked_checkpoint(
        cut.groupBy("doc_id")
        .agg(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.sequence(F.col("s"), F.col("s") + (SPAN_K - 1))
                    )
                )
            ).alias("dpos"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .select("doc_id", merge_cut_runs(F.col("dpos")).alias("dpos"), "n_occ")
    )
    decisions.count()  # materialize decisions before mutating the store
    if batch_id in folded_span_bids(spark, store_dir):
        # already folded by compact_span_store: the compact file
        # carries this bid's spans — appending would double-insert
        # under a fresh partition the folded set can't cover
        return decisions
    new_spans = (
        probed.where((F.col("rn") == 1) & F.col("_seen").isNull())
        .select("sp")
        .distinct()
    )
    new_spans.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, "spans", f"bid={batch_id}")
    )
    return decisions


def apply_span_cuts(docs: DataFrame, decisions: DataFrame) -> DataFrame:
    """Rebuild batch text minus the cut positions — (doc_id, text,
    substr_removed_text, n_dup_spans_removed, n_span_tokens_removed),
    single-space canonical join, the text_profile column semantics."""
    from ..functions.text import tokens

    j = docs.join(decisions, "doc_id", "left").select(
        "doc_id", "text", tokens(F.col("text")).alias("toks"), "dpos", "n_occ"
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: F.col("dpos").isNull()
        | ~F.array_contains(F.col("dpos"), i + 1),
    )
    return j.select(
        "doc_id",
        "text",
        F.array_join(kept, " ").alias("substr_removed_text"),
        F.when(
            F.col("toks").isNotNull(),
            F.coalesce(F.col("n_occ"), F.lit(0)).cast("long"),
        ).alias("n_dup_spans_removed"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_span_tokens_removed"),
    )
