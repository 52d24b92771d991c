"""Online parameter server on keyed streaming state (SURVEY.md §2 A1
online form, B1 online MF, D21).

Reference: `FlinkParameterServer.scala#transform` wires a *cyclic*
dataflow — workers pull/push against parameter servers over an iteration
edge, per-record sequential updates [C-high]. Spark forbids cycles; the
equivalent is to key the stream by param_id and co-locate the server
state with the worker logic in a stateful grouped-map operator: pull =
read local state, push = write it. No round-trip exists because the
record is already where its parameter lives — the shuffle performs the
reference's `paramId % psParallelism` routing [C-high].

Implementation note: Spark 4's `transformWithStateInPandas` is the
preferred API, but its driver worker needs a working google.protobuf
(absent in this container), so the engine uses the Arrow-based
`applyInPandasWithState` — identical keyed-state semantics (value state
per key, update-mode emission); swapping to transformWithStateInPandas
is a mechanical change when the environment allows.

This module implements online MF (the reference's flagship PS app,
`matrix/factorization/PSOnlineMatrixFactorization` [C-high]): ratings
keyed by item id; state = the item factor vector; per record (in seq
order within a micro-batch) a TRUE sequential SGD step — the semantics
the batch trainer (ps/mf.py) intentionally approximates with mini-batch
epochs.

Scale: state is sharded by key across partitions exactly like PS
instances; RocksDB state store + changelog checkpointing are the
production knobs; per-batch work is bounded by source rate control (A7,
maxFilesPerTrigger / maxOffsetsPerTrigger).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.hashing import KNUTH, MOD
from ..ps.mf import FACTOR_HI, FACTOR_LO, ITEM_SEED, K, LR, USER_SEED

STATE_SCHEMA = StructType([StructField("vec", ArrayType(DoubleType()))])
OUTPUT_SCHEMA = StructType(
    [StructField("item", LongType()), StructField("n_updates", LongType())]
    + [StructField(f"f{j}", DoubleType()) for j in range(K)]
)


def _factor(idx: int, j: int, seed: int) -> float:
    h = ((idx + 1) * KNUTH + (j + 1) * 40503 + seed * 97) % MOD
    return FACTOR_LO + h / MOD * (FACTOR_HI - FACTOR_LO)


def _user_vec(user: int) -> list[float]:
    return [_factor(user, j, USER_SEED) for j in range(K)]


def _item_vec(item: int) -> list[float]:
    return [_factor(item, j, ITEM_SEED) for j in range(K)]


def _online_mf_update(key, pdf_iter, state: GroupState):
    """Per-item-key sequential SGD: PS server + worker logic fused on
    co-located state (pull = state.get, push = state.update)."""
    item = key[0]
    v = list(state.get[0]) if state.exists else _item_vec(item)
    n = 0
    # Materialize the whole micro-batch for this key before sorting: a key
    # whose rows span multiple Arrow batches (> arrow.maxRecordsPerBatch)
    # must still process records in global seq order, not per-chunk order.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("seq")
        users = pdf["user"].to_numpy()
        ratings = pdf["rating"].to_numpy()
        for user, rating in zip(users, ratings):
            u = _user_vec(int(user))
            e = float(rating) - sum(a * b for a, b in zip(u, v))
            v = [vi + LR * e * ui for vi, ui in zip(v, u)]
            n += 1
    state.update(([float(x) for x in v],))  # plain floats: numpy scalars break state pickling
    yield pd.DataFrame([{"item": item, "n_updates": n, **{f"f{j}": v[j] for j in range(K)}}])


def online_mf_stream(spark: SparkSession, ratings_stream: DataFrame) -> DataFrame:
    """ratings_stream: streaming DF (seq, user, item, rating) -> per-item
    updated factors after each micro-batch (Update mode)."""
    return ratings_stream.groupBy("item").applyInPandasWithState(
        _online_mf_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sequential_reference(ratings: list[tuple[int, int, int, float]]) -> dict[int, list[float]]:
    """Driver-side reference implementation (same math, plain Python) for
    tests: ratings as (seq, user, item, rating), processed in seq order
    per item."""
    state: dict[int, list[float]] = {}
    for seq, user, item, rating in sorted(ratings):
        v = state.get(item) or _item_vec(item)
        u = _user_vec(user)
        e = rating - sum(a * b for a, b in zip(u, v))
        state[item] = [vi + LR * e * ui for vi, ui in zip(v, u)]
    return state
