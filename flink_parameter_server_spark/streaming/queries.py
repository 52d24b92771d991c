"""Registered driver-surface queries for the streaming layer.

Windowed streaming forms are correctness-checked in tests against their
oracle-checked batch duals (operators/windows.py); registering a full
stream execution per driver run would only re-run those. The one thing
with no batch dual — true per-record sequential PS semantics (A1/B1
online, D21) — is registered rows-only here.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from ..plans.registry import register
from ..ps import mf


@register(
    "online_mf_sequential",
    oracle=None,
    tags=("A1", "B1", "D21", "A7"),
    doc="Online MF on keyed streaming state (applyInPandasWithState): "
    "ratings stream keyed by item, per-record sequential SGD against "
    "co-located value state — the faithful form of the reference's cyclic "
    "PS loop (FlinkParameterServer#transform + "
    "PSOnlineMatrixFactorization [C-high]). Not SQL-expressible -> "
    "rows-only; numerics verified against a sequential reference "
    "implementation in tests/test_streaming.py.",
)
def online_mf_sequential(spark, sf_dir):
    from .online_ps import K, online_mf_stream

    ratings = (
        mf.ratings(spark, sf_dir)
        .where(F.col("user") % 10 == 0)
        .withColumn("seq", F.monotonically_increasing_id())
        .select("seq", "user", "item", "rating")
    )
    tmp = tempfile.mkdtemp(prefix="fps_online_mf_")
    name = f"online_mf_{uuid.uuid4().hex[:8]}"
    ratings.coalesce(1).write.parquet(f"{tmp}/src")
    stream = spark.readStream.schema(ratings.schema).parquet(f"{tmp}/src")
    q = (
        online_mf_stream(spark, stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        "item", "n_updates", *[F.round(F.col(f"f{j}"), 6).alias(f"f{j}") for j in range(K)]
    )
