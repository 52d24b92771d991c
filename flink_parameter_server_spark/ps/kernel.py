"""Batch parameter-server kernel.

Reference mapping (SURVEY.md §0 citation convention — public repo layout
`src/main/scala/hu/sztaki/ilab/ps/`):

- `FlinkParameterServer.scala#transform` [C-high]  -> :meth:`BatchParameterServer.iterate`
  (the cyclic worker<->server dataflow becomes a driver-side epoch loop;
  each epoch is a pure DataFrame program, so Catalyst/AQE optimizes every
  step and there is no iteration liveness timeout to tune).
- `ParameterServerClient#pull` [C-high]            -> :meth:`pull` (equi-join on param_id)
- `ParameterServerClient#push` [C-high]            -> :meth:`push` (groupBy(param_id).sum fold)
- `server/SimplePSLogic` (lazy init + fold) [C-med] -> deterministic
  ``init_fn`` + ``coalesce`` on the outer join (init is a pure function of
  param_id + seed, so it needs no state and the DuckDB oracle can
  reproduce it).
- `FlinkParameterServer.scala#transformWithModelLoad` [C-med] -> :meth:`load`
- `ParameterServerLogic.close -> output` (model dump) [C-med] -> :attr:`params`
  (the state *is* a DataFrame; write it with ``.write.parquet``).

Scale design: params are hash-partitioned by param_id exactly like the
reference's `paramId % psParallelism` partitioner [C-high] — Spark's
shuffle does this implicitly on every groupBy/join. Pushes are combined
map-side (the reference's client/server message combiners
`common/CombinationLogic` [C-med] are subsumed by partial aggregation).
Per-epoch ``persist`` + periodic ``localCheckpoint`` keeps the lineage
from growing linearly with epochs — the classic iterative-Spark trap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..scratch import scoped_checkpoint, scratch, track_checkpoint_ids

InitFn = Callable[[Column], Column]  # param_id -> initial value (deterministic)


class BatchParameterServer:
    """Sharded mutable model state as a DataFrame(param_id BIGINT, value ARRAY<DOUBLE>).

    ``updates`` pushed via :meth:`push` are summed per key (additive fold,
    the reference's default ``paramUpdate`` [C-med]) and merged into state;
    unseen keys are lazily initialized with ``init_fn``.
    """

    def __init__(
        self,
        init_fn: InitFn,
        params: DataFrame | None = None,
        checkpoint_every: int = 5,
        k: int | None = None,
    ) -> None:
        self.init_fn = init_fn
        self.params = params  # None => everything lazily initialized
        self.checkpoint_every = checkpoint_every
        # statically-known vector dimension: lets the push fold run as k
        # flat column sums (one aggregation, no k-fold row explosion);
        # None keeps the generic explode fold for arbitrary-length values
        self.k = k
        self._epoch = 0

    # -- A6: transformWithModelLoad ---------------------------------------
    @classmethod
    def load(cls, spark, path: str, init_fn: InitFn) -> "BatchParameterServer":
        """Seed server state from a previously dumped model."""
        return cls(init_fn, params=spark.read.parquet(path))

    # -- A2: pull ----------------------------------------------------------
    def pull(self, keys: DataFrame, key_col: str = "param_id") -> DataFrame:
        """Resolve current values for ``keys`` (lazy init for misses).

        The request/response round-trip of the reference becomes one
        equi-join; broadcast if the key side is small, else a shuffle
        hash/sort-merge join that AQE picks.

        Cold state (no params yet) builds the init table over DISTINCT
        keys and joins it back instead of inlining ``init_fn`` per
        request row: the k-hash init expression runs O(|param ids|)
        times, not O(|requests|), and the value arrives as a join
        attribute — which stops Catalyst's projection collapse from
        re-inlining the whole init array into every downstream
        element_at/transform reference (measured 25x on the sf0.1 MF
        epoch: the inline form re-evaluated 8-hash vectors per delta
        element per rating row).
        """
        out = keys.withColumnRenamed(key_col, "param_id")
        if self.params is None:
            init_tab = (
                out.select("param_id")
                .distinct()
                .withColumn("value", self.init_fn(F.col("param_id")))
            )
            return out.join(init_tab, "param_id")
        joined = out.join(self.params, "param_id", "left")
        return joined.withColumn("value", F.coalesce(F.col("value"), self.init_fn(F.col("param_id"))))

    # -- A3/A4/A5: push + server fold ---------------------------------------
    def push(self, deltas: DataFrame) -> None:
        """Fold additive deltas (param_id, delta ARRAY<DOUBLE>) into state.

        groupBy does map-side partial aggregation (the reference's message
        combiner); the outer join + coalesce implements SimplePSLogic's
        lazy init + fold.
        """
        agg = _fold_deltas(deltas, self.k)
        base = self.params
        if base is None:
            merged = agg.select(
                "param_id",
                F.zip_with(self.init_fn(F.col("param_id")), F.col("delta"), lambda a, b: a + b).alias("value"),
            )
        else:
            merged = base.join(agg, "param_id", "full").select(
                "param_id",
                F.zip_with(
                    F.coalesce(F.col("value"), self.init_fn(F.col("param_id"))),
                    F.coalesce(F.col("delta"), _zeros_like(F.col("value"), self.init_fn(F.col("param_id")))),
                    lambda a, b: a + b,
                ).alias("value"),
            )
        self._epoch += 1
        # scratch-tracked: superseded epochs are unpersisted below as soon
        # as the next epoch lands; the FINAL epoch's cache (and checkpoint
        # blocks) are released when the next registry query begins
        # (scratch.py lifecycle contract).
        merged = scratch(merged)
        if self._epoch % self.checkpoint_every == 0:
            spark = merged.sparkSession
            # exact-attributed lineage cut (r15): scoped_checkpoint reads
            # the checkpoint RDD id off the LogicalRDD plan, so a trainer
            # checkpointing on one driver thread can never claim (and
            # later free) blocks a concurrent thread persisted
            ids: set[int] = set()
            merged = scoped_checkpoint(merged, ids)
            track_checkpoint_ids(spark, ids)
        old = self.params
        self.params = merged
        if old is not None:
            old.unpersist()

    # -- A1: transform (the iteration) --------------------------------------
    def iterate(
        self,
        data: DataFrame,
        step_fn: Callable[[DataFrame, "BatchParameterServer"], DataFrame],
        epochs: int,
    ) -> DataFrame:
        """Driver-loop replacement for the cyclic dataflow: each epoch the
        worker logic computes deltas from (data, current params) and pushes
        them. Returns the final model DataFrame.
        """
        for _ in range(epochs):
            self.push(step_fn(data, self))
        assert self.params is not None
        return self.params


def _fold_deltas(deltas: DataFrame, k: int | None = None) -> DataFrame:
    """Elementwise sum of (param_id, delta ARRAY<DOUBLE>) rows per key.

    Generic form (k unknown): explode to (param_id, dim, v) triplets and
    `sum` per (param_id, dim) — the fold gets map-side partial
    aggregation and per-key state is O(1) per dimension, never
    O(fan-in x k), which matters when fan-in is instances-per-feature
    (the PA trainers at 100 TB). The final re-assembly groups exactly k
    rows per key, so its collect_list is bounded by the model
    dimensionality, not the data.

    Static form (k known): k flat `sum(element_at(delta, j))` aggregates
    in ONE aggregation — same map-side combine, no k-fold row explosion
    and no second shuffle (measured 3s -> 0.9s per MF epoch fold at
    sf0.1, k=8). Element extraction over the delta expression is
    simplified by Catalyst (SimplifyExtractValueOps), so the input
    transform is not re-evaluated per dimension.
    """
    if k is not None:
        sums = deltas.groupBy("param_id").agg(
            *[F.sum(F.element_at("delta", j + 1)).alias(f"_d{j}") for j in range(k)]
        )
        return sums.select(
            "param_id", F.array(*[F.col(f"_d{j}") for j in range(k)]).alias("delta")
        )
    exploded = deltas.select("param_id", F.posexplode("delta").alias("dim", "v"))
    summed = exploded.groupBy("param_id", "dim").agg(F.sum("v").alias("v"))
    return (
        summed.groupBy("param_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "v"))).alias("__pairs"))
        .select("param_id", F.transform(F.col("__pairs"), lambda p: p["v"]).alias("delta"))
    )


def _zeros_like(value: Column, fallback: Column) -> Column:
    return F.transform(F.coalesce(value, fallback), lambda x: x * F.lit(0.0))
