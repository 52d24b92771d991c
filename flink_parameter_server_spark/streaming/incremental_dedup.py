"""Incremental near-dup dedup against a persisted signature store —
the continuous-ingestion form of D24 (north-star: a 100 TB corpus is
not deduped once, it GROWS; every arriving batch must be checked
against everything already accepted without recomputing the corpus).

State = two append-only parquet tables under ``store_dir``:

- ``bands``    (doc_id, b, band_key) — MinHash-LSH band signatures of
  every ACCEPTED doc (N_BANDS rows/doc), written ``partitionBy("b")``
  so the candidate probe scans band-by-band.
- ``shingles`` (doc_id, shingles)    — the exact-verify sets.

Per batch (:func:`process_batch`):

1. signature the batch with the SAME seeded pipeline as the batch
   operators (operators/dedup.py token_hashes -> shingle_sets ->
   minhash_bands — bit-identical keys, so incremental and batch modes
   agree by construction);
2. ``dup_of_store``: batch bands equi-join store bands on (b,
   band_key), exact Jaccard >= JACCARD_T verify against store
   shingles;
3. ``dup_in_batch``: survivors near-dup-clustered within the batch
   (star connected components over the verified pair graph); only each
   cluster's min-doc_id canonical is accepted;
4. accepted docs' signatures APPEND to the store; decisions return.

Semantics vs batch `dedup_cluster_canonical` — greedy keep-first, NOT
connected components across batches: a doc is rejected only if it
matches an ACCEPTED doc; rejected docs' signatures are not retained,
so a transitive chain A~B, B~C (A !~ C) split across batches keeps A
AND C, where whole-corpus CC keeps only A. That is the standard
streaming-dedup contract (the store stays bounded by accepted docs,
the decision for a doc never changes retroactively) and exactly
matches batch mode on chain-free corpora — both pinned in
tests/test_incremental_dedup.py.

Scale shape: the probe is a keyed equi-join against a partition-pruned
band scan; no step depends on batch count, and the store grows only
with ACCEPTED (unique) content. Wire into Structured Streaming with
:func:`dedup_stream_writer` (foreachBatch — the right tool when a
micro-batch must join mutable external state and update it per
batch). foreachBatch is at-least-once, not transactional: replay
safety comes from idempotent writes — the probe's self-guard, the
already-present append skip, and per-batch decision overwrite (see
:func:`dedup_stream_writer`). Doc ids must be unique across the
corpus (store + all batches share one id space); the self-guard
relies on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators._dedup_core import (
    JACCARD_T,
    minhash_bands,
    shingle_sets,
    star_connected_components,
    token_hashes,
)

_BANDS_SCHEMA = "doc_id bigint, b int, band_key bigint"
_SH_SCHEMA = "doc_id bigint, shingles array<bigint>"


def _store(spark, store_dir: str, name: str, schema: str) -> DataFrame:
    # existence via the Hadoop FS API (r11, ADVICE r10 class): a
    # driver-local isdir silently reads a populated remote store as
    # EMPTY — every batch would then dedup against nothing
    from ..sources.fsutil import path_exists

    path = os.path.join(store_dir, name)
    if path_exists(spark, path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def signatures(docs: DataFrame, scratch_ids: set[int] | None = None) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) for a (doc_id, text) batch — the exact batch
    pipeline arithmetic (seeded, oracle-replayable).

    ``scratch_ids``: the shingle build is checkpointed; its persisted
    RDD ids are attributed there (the caller frees them at its own
    consumption barrier — r9 review: a global diff-unpersist in one
    foreachBatch sink frees a concurrent sink's blocks). When omitted,
    the ids are tracked for ``scratch.release()`` instead."""
    from ..scratch import scoped_checkpoint, track_checkpoint_ids

    own = scratch_ids is None
    ids: set[int] = set() if own else scratch_ids
    sh = scoped_checkpoint(shingle_sets(token_hashes(docs.select("doc_id", "text"))), ids)
    if own:
        track_checkpoint_ids(sh.sparkSession, ids)
    return sh, minhash_bands(sh)


def process_batch(
    spark,
    docs: DataFrame,
    store_dir: str,
    sigs=None,
    scratch_ids: set[int] | None = None,
    append: bool = True,
) -> DataFrame:
    """Run one batch through the store; returns decisions
    (doc_id, decision, dup_of) with decision in
    'accepted' | 'dup_of_store' | 'dup_in_batch' | 'no_shingles'.

    ``dup_of`` is the (min) accepted doc the rejection traces to;
    'no_shingles' marks docs too short to signature (< 3 tokens) —
    they pass through un-deduped, mirroring the batch operators'
    len >= SHINGLE_N gate.

    ``sigs``: optional precomputed ``(sh, bands)`` from
    :func:`signatures` over a SUPERSET of ``docs`` (filtered here by
    doc_id) — lets a composing pipeline (incremental_curate) signature
    each batch once instead of once per stage.

    ``scratch_ids``: see :func:`signatures` — exact attribution of the
    checkpoints this call pins; defaults to scratch-release tracking.

    ``append=False`` skips the store writes: a composing pipeline with
    LATER gates (incremental_curate's r9 semantic stage) must persist
    signatures only for docs accepted END-TO-END — the store's
    keep-first contract is "rejected only against accepted content",
    which breaks if a later stage rejects a doc whose signatures
    already landed. The caller then appends via
    :func:`append_signatures` after its final gate.
    """
    from ..scratch import scoped_checkpoint, track_checkpoint_ids

    own = scratch_ids is None
    ids: set[int] = set() if own else scratch_ids

    docs = scoped_checkpoint(docs.select("doc_id", "text"), ids)
    if sigs is None:
        sh, bands = signatures(docs, scratch_ids=ids)
    else:
        batch_ids = docs.select("doc_id")
        sh = sigs[0].join(batch_ids, "doc_id", "left_semi")
        bands = sigs[1].join(batch_ids, "doc_id", "left_semi")
    bands = scoped_checkpoint(bands, ids)

    store_bands = _store(spark, store_dir, "bands", _BANDS_SCHEMA)
    store_sh = _store(spark, store_dir, "shingles", _SH_SCHEMA)

    # --- stage 1: against the store ---
    # The self-guard (n.doc_id != s.doc_id) makes REPLAY idempotent:
    # foreachBatch is at-least-once, so a replayed micro-batch probes a
    # store that already holds its own accepted docs — without the
    # guard they'd reclassify as dup_of_store of themselves (ADVICE
    # r7). Store and batches share one corpus id space by contract
    # (docstring), so an equal id IS the same doc, not a collision.
    cand_store = (
        bands.alias("n")
        .join(
            store_bands.alias("s"),
            (F.col("n.b") == F.col("s.b"))
            & (F.col("n.band_key") == F.col("s.band_key"))
            & (F.col("n.doc_id") != F.col("s.doc_id")),
        )
        .select(F.col("n.doc_id").alias("doc_id"), F.col("s.doc_id").alias("old_id"))
        .distinct()
    )
    store_dups = (
        cand_store.join(sh.select(F.col("doc_id"), F.col("shingles").alias("sh_n")), "doc_id")
        .join(
            store_sh.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sh_s")),
            "old_id",
        )
        .where(
            F.size(F.array_intersect("sh_n", "sh_s")).cast("double")
            / F.size(F.array_union("sh_n", "sh_s"))
            >= JACCARD_T
        )
        .groupBy("doc_id")
        .agg(F.min("old_id").alias("dup_of"))
    )
    store_dups = scoped_checkpoint(store_dups, ids)

    # --- stage 2: within the batch, among store-survivors ---
    surv = scoped_checkpoint(sh.join(store_dups.select("doc_id"), "doc_id", "left_anti"), ids)
    sbands = minhash_bands(surv)
    a, b = sbands.alias("a"), sbands.alias("b")
    cand_in = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pairs = (
        cand_in.join(surv.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(surv.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
        .where(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
            >= JACCARD_T
        )
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    parents, _ = star_connected_components(pairs, scratch_ids=ids)
    batch_dups = scoped_checkpoint(
        parents.select(F.col("a").alias("doc_id"), F.col("b").alias("dup_of")), ids
    )

    accepted = surv.join(batch_dups.select("doc_id"), "doc_id", "left_anti")

    # --- persist accepted signatures (append-only, replay-idempotent;
    # presence-skip semantics in _append_sig_frames) ---
    if append:
        _append_sig_frames(store_dir, store_bands, store_sh, accepted, ids)

    if own:
        track_checkpoint_ids(spark, ids)
    return (
        docs.select("doc_id")
        .join(sh.select("doc_id", F.lit(True).alias("has_sh")), "doc_id", "left")
        .join(store_dups.select("doc_id", F.col("dup_of").alias("d_store")), "doc_id", "left")
        .join(batch_dups.select("doc_id", F.col("dup_of").alias("d_batch")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("has_sh").isNull(), F.lit("no_shingles"))
            .when(F.col("d_store").isNotNull(), F.lit("dup_of_store"))
            .when(F.col("d_batch").isNotNull(), F.lit("dup_in_batch"))
            .otherwise(F.lit("accepted"))
            .alias("decision"),
            F.coalesce("d_store", "d_batch").alias("dup_of"),
        )
    )


def _append_sig_frames(store_dir, store_bands, store_sh, accepted, ids) -> None:
    """Append an accepted (doc_id, shingles) frame to both store
    tables with the per-table presence skip (bands are written first,
    so a crash between the writes leaves a doc bands-only; each table
    skips what IT already has — review r8)."""
    from ..scratch import scoped_checkpoint

    present_bands = store_bands.select("doc_id").distinct()
    present_sh = store_sh.select("doc_id")
    new_for_bands = scoped_checkpoint(accepted.join(present_bands, "doc_id", "left_anti"), ids)
    minhash_bands(new_for_bands).write.mode("append").partitionBy("b").parquet(
        os.path.join(store_dir, "bands")
    )
    accepted.join(present_sh, "doc_id", "left_anti").select(
        "doc_id", "shingles"
    ).write.mode("append").parquet(os.path.join(store_dir, "shingles"))


def append_signatures(
    spark, store_dir: str, sh, accepted_ids, scratch_ids: set[int]
) -> None:
    """Deferred half of ``process_batch(append=False)``: persist
    signatures for the docs that survived EVERY downstream gate.
    ``sh``: the (doc_id, shingles) frame the batch was signatured with;
    ``accepted_ids``: a (doc_id) frame of the end-to-end survivors."""
    store_bands = _store(spark, store_dir, "bands", _BANDS_SCHEMA)
    store_sh = _store(spark, store_dir, "shingles", _SH_SCHEMA)
    accepted = sh.join(accepted_ids, "doc_id", "left_semi")
    _append_sig_frames(store_dir, store_bands, store_sh, accepted, scratch_ids)


def build_signature_store(spark, docs: DataFrame, store_dir: str) -> None:
    """Seed a store from a static corpus WITHOUT dedup semantics: every
    doc's signatures persist (the store = that corpus verbatim). The
    decontamination primitive: build the store from the EVAL/BENCHMARK
    set, then :func:`contamination_check` any training corpus against
    it — the GPT-3/Pile decontamination shape, reusing the identical
    probe join. Self-contained scratch: the writes consume the
    signature checkpoint, so its ids free here."""
    from ..scratch import unpersist_rdd_ids

    ids: set[int] = set()
    sh, bands = signatures(docs, scratch_ids=ids)
    bands.write.mode("append").partitionBy("b").parquet(os.path.join(store_dir, "bands"))
    sh.select("doc_id", "shingles").write.mode("append").parquet(
        os.path.join(store_dir, "shingles")
    )
    unpersist_rdd_ids(spark, ids)


def contamination_check(
    spark, docs: DataFrame, store_dir: str, sigs=None, scratch_ids: set[int] | None = None
) -> DataFrame:
    """(doc_id, contaminated_by) — training docs that near-duplicate a
    store (eval-set) doc; clean docs are absent. Read-only: unlike
    :func:`process_batch` nothing appends, so the same eval store
    screens any number of corpora. ``sigs``: optional precomputed
    ``(sh, bands)`` for ``docs`` (see :func:`process_batch`);
    ``scratch_ids``: see :func:`signatures`."""
    sh, bands = signatures(docs, scratch_ids=scratch_ids) if sigs is None else sigs
    store_bands = _store(spark, store_dir, "bands", _BANDS_SCHEMA)
    store_sh = _store(spark, store_dir, "shingles", _SH_SCHEMA)
    cand = (
        bands.alias("n")
        .join(
            store_bands.alias("s"),
            (F.col("n.b") == F.col("s.b")) & (F.col("n.band_key") == F.col("s.band_key")),
        )
        .select(F.col("n.doc_id").alias("doc_id"), F.col("s.doc_id").alias("old_id"))
        .distinct()
    )
    return (
        cand.join(sh.select("doc_id", F.col("shingles").alias("sh_n")), "doc_id")
        .join(
            store_sh.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sh_s")),
            "old_id",
        )
        .where(
            F.size(F.array_intersect("sh_n", "sh_s")).cast("double")
            / F.size(F.array_union("sh_n", "sh_s"))
            >= JACCARD_T
        )
        .groupBy("doc_id")
        .agg(F.min("old_id").alias("contaminated_by"))
    )


def compact_store(spark, store_dir: str, target_files_per_band: int = 1) -> None:
    """Rewrite the append-only store coalesced: every micro-batch
    appends one file per touched band partition, so a long-lived store
    accumulates thousands of small files (the classic streaming-sink
    pathology — at 100 TB the band scan becomes metadata-bound).
    Rewrites into a sibling dir then swaps atomically-enough for a
    single-writer store (run between batches, not concurrently with
    one). All filesystem ops route through the Hadoop FS API (fsutil —
    r12, VERDICT r11 #2), so the maintenance path works on the same
    hdfs://s3a:// store the read path probes; the object-store rename
    window (rename = copy) is covered by the same single-writer
    between-batches discipline."""
    from ..sources.fsutil import delete_path, path_exists, rename_path

    # "hashes" is the streaming-curation exact-dup table
    # (incremental_curate.py) — same append-per-batch small-file growth
    for name, part in (("bands", "b"), ("shingles", None), ("hashes", None)):
        path = os.path.join(store_dir, name)
        if not path_exists(spark, path):
            continue
        tmp = path + "_compacting"
        df = spark.read.parquet(path)
        if part:
            df.repartition(target_files_per_band, part).write.mode(
                "overwrite"
            ).partitionBy(part).parquet(tmp)
        else:
            df.coalesce(max(1, target_files_per_band)).write.mode("overwrite").parquet(tmp)
        delete_path(spark, path)
        rename_path(spark, tmp, path)


def guard_decisions_dir(spark, decisions_dir: str) -> None:
    """Refuse a decisions dir holding FLAT (pre-bid-layout) parquet:
    partition discovery over a mixed flat+bid=<n> layout silently
    drops every flat row from reads (verified empirically, review r8)
    — fail loudly instead of losing history. Shared by all three
    stream writers (dedup + curation + semantic). Probes through the
    Hadoop FS API (r12): a driver-local listdir returns nothing on a
    remote scheme, which would silently WAIVE the guard — exactly the
    silent-failure read-probe class fsutil exists for."""
    from ..sources.fsutil import list_dir_names, path_exists

    if path_exists(spark, decisions_dir) and any(
        f.endswith(".parquet") and not f.startswith(("_", "."))
        for f in list_dir_names(spark, decisions_dir)
    ):
        raise ValueError(
            f"decisions dir {decisions_dir!r} contains flat (pre-bid-layout) "
            "parquet files; reading a mixed flat+bid=<n> layout silently "
            "drops the flat rows. Migrate them first, e.g. "
            "spark.read.parquet(dir).write.parquet(dir + '/bid=-1') "
            "and remove the flat files."
        )


def dedup_stream_writer(spark, docs_stream: DataFrame, store_dir: str, decisions_dir: str):
    """Wire :func:`process_batch` into a Structured Streaming query:
    foreachBatch joins each micro-batch against the mutable store and
    writes decisions to ``decisions_dir`` (doc_id, decision, dup_of,
    batch_id). Returns the started StreamingQuery.

    Replay idempotency (foreachBatch is at-least-once, ADVICE r7):
    each batch's decisions land under a ``bid=<batch_id>`` subdir with
    mode('overwrite'), so a replayed batch replaces its own rows
    instead of appending duplicates; the store side is idempotent via
    process_batch's self-guard + already-present skip. A replayed
    batch may re-decide a former 'dup_in_batch' as 'dup_of_store' (its
    canonical is in the store by then) — same ``dup_of``, and the
    overwrite keeps exactly one decision row per doc."""

    guard_decisions_dir(spark, decisions_dir)

    def _sink(batch_df, batch_id: int) -> None:
        # per-batch scratch release (ADVICE r8): the decisions write
        # consumes every checkpoint process_batch pinned, so free them
        # here instead of letting a long stream accumulate blocks.
        # EXACT attribution, not a global before/after diff — a diff
        # would claim (and free) checkpoints a CONCURRENT sink on the
        # same session pinned in the window, corrupting its batch (r9
        # review; scoped_checkpoint's lock makes the ids exact).
        from ..scratch import unpersist_rdd_ids

        ids: set[int] = set()
        process_batch(spark, batch_df, store_dir, scratch_ids=ids).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(
            os.path.join(decisions_dir, f"bid={batch_id}")
        )
        unpersist_rdd_ids(spark, ids)

    return (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(store_dir, "_checkpoint"))
        .start()
    )
