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

from ..operators.windows import SESSION_GAP_US
from ..plans.registry import register
from ..ps import mf


@register(
    "streaming_tumbling_daily",
    oracle=f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n
FROM events GROUP BY 1, 2
""",
    tags=("D17",),
    doc="D17 executed as a REAL stream (readStream -> watermark -> window "
    "agg -> sink, availableNow): the materialized sink output is checked "
    "against the same oracle as the batch dual — Structured Streaming's "
    "incremental execution must reproduce the batch answer.",
)
def streaming_tumbling_daily(spark, sf_dir):
    from .windows import run_to_memory, tumbling_daily_stream

    name = f"stq_tumb_{uuid.uuid4().hex[:8]}"
    return run_to_memory(tumbling_daily_stream(spark, sf_dir), name)


@register(
    "streaming_session_windows",
    oracle=f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), m AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
       max(us) - min(us) AS dur_us
FROM s GROUP BY user_id, sid
""",
    tags=("D18",),
    doc="D18 executed as a REAL stream: session windows on keyed state, "
    "materialized sink checked against the lag+cumsum island oracle.",
)
def streaming_session_windows(spark, sf_dir):
    from .windows import run_to_memory, session_windows_stream

    name = f"stq_sess_{uuid.uuid4().hex[:8]}"
    return run_to_memory(session_windows_stream(spark, sf_dir), name)


@register(
    "streaming_session_timeout",
    oracle=f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), m AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
), sess AS (
  SELECT user_id, sid, min(us) AS session_start_us, count(*) AS n_events,
         max(us) - min(us) AS dur_us, max(us) AS last_us,
         max(sid) OVER (PARTITION BY user_id) AS max_sid
  FROM s GROUP BY user_id, sid
), mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events)
SELECT user_id, session_start_us, n_events, dur_us,
       CASE WHEN sid < max_sid THEN 'data'
            ELSE 'timeout' END AS close_reason
FROM sess, mx
WHERE sid < max_sid
   OR last_us // 1000 + {SESSION_GAP_US // 1000} < max_us // 1000 - 3600000
""",
    tags=("D18", "D21", "D2"),
    doc="D21's state-timeout facet as a REAL stream: custom sessionization "
    "on applyInPandasWithState with GroupStateTimeout.EventTimeTimeout — "
    "sessions close either when a same-user event arrives past the 30-min "
    "gap ('data') or when the watermark passes last+gap in the trailing "
    "no-data micro-batch ('timeout'); final sessions the watermark never "
    "reaches stay open and are unreported. Oracle = the lag/cumsum island "
    "SQL, non-final islands tagged 'data', final islands tagged 'timeout' "
    "only when last+gap < max_ts - 1h (the final watermark, ms-truncated "
    "exactly as Spark tracks it).",
)
def streaming_session_timeout(spark, sf_dir):
    from .sinks import session_timeout_stream
    from .windows import run_to_memory

    name = f"stq_sesstmo_{uuid.uuid4().hex[:8]}"
    return run_to_memory(session_timeout_stream(spark, sf_dir), name)


@register(
    "streaming_upsert_sink",
    oracle="""
SELECT event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events GROUP BY 1
""",
    tags=("D2", "D17"),
    doc="D2 exactly-once file sink as a REAL stream: update-mode aggregate "
    "-> foreachBatch writes each micro-batch's updated rows to a "
    "directory keyed by batch id (a replayed batch overwrites the same "
    "directory, so retries are idempotent), and readers resolve "
    "last-write-wins per key by max batch id — the production upsert "
    "pattern for non-transactional warehouse tables. Oracle = the plain "
    "batch aggregate: the latest update per key must equal the full-data "
    "answer regardless of how the stream was micro-batched.",
)
def streaming_upsert_sink(spark, sf_dir):
    from .sinks import foreachbatch_upsert

    return foreachbatch_upsert(spark, sf_dir)


@register(
    "streaming_purchase_attribution",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
""",
    tags=("D17", "D21"),
    doc="Stream-stream interval join executed as a REAL two-stream job "
    "(both sides watermarked, state bounded by interval+delay), checked "
    "against the batch interval-join oracle.",
)
def streaming_purchase_attribution(spark, sf_dir):
    from .joins import purchase_click_attribution_stream
    from .windows import run_to_memory

    name = f"stq_attr_{uuid.uuid4().hex[:8]}"
    return run_to_memory(purchase_click_attribution_stream(spark, sf_dir), name)


def _run_instance_stream(spark, src_df, build_stream, prefix: str, out_cols):
    """Write src_df as a single-file parquet source, stream it through
    build_stream with an availableNow trigger into a memory sink, return
    the materialized table projected to out_cols."""
    tmp = tempfile.mkdtemp(prefix=prefix)
    name = f"{prefix}{uuid.uuid4().hex[:8]}"
    src_df.coalesce(1).write.parquet(f"{tmp}/src")
    stream = spark.readStream.schema(src_df.schema).parquet(f"{tmp}/src")
    q = (
        build_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(*out_cols)


@register(
    "streaming_static_enrich",
    oracle="""
SELECT c_mktsegment AS segment, event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) + 0.0 AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
    tags=("D17", "D4"),
    doc="Stream-static join executed as a REAL stream: event stream "
    "enriched with the static customer dimension (broadcast per "
    "micro-batch, no join state), complete-mode aggregate per "
    "(segment, event_type) checked against the batch-join oracle.",
)
def streaming_static_enrich(spark, sf_dir):
    from .joins import stream_static_enrich
    from .windows import run_to_memory

    name = f"stq_enrich_{uuid.uuid4().hex[:8]}"
    return run_to_memory(stream_static_enrich(spark, sf_dir), name)


@register(
    "pa_online_sequential",
    oracle=None,
    tags=("A1", "B8", "D21", "A7"),
    doc="Online PA-I binary training on keyed streaming state "
    "(applyInPandasWithState): instances in seq order, per-record "
    "margin/tau/update against the CURRENT weights — the reference's "
    "per-record trajectory (PassiveAggressiveParameterServer"
    "#transformBinary [C-high]) that the batch trainers approximate "
    "with mini-batch epochs. Deterministic order forces the "
    "psParallelism=1 trajectory (see online_ps.online_pa_stream "
    "docstring). Not SQL-expressible -> rows-only; numerics verified "
    "against pa_sequential_reference in tests/test_streaming.py.",
)
def pa_online_sequential(spark, sf_dir):
    from ..ps import pa
    from .online_ps import online_pa_stream

    inst = (
        pa.instances(spark, sf_dir)
        .where(F.col("row_id") % 4 == 0)
        .select(
            F.col("row_id").alias("seq"),
            F.lit(0).cast("long").alias("model_id"),
            "y",
            "x",
        )
    )
    out = _run_instance_stream(
        spark, inst, lambda s: online_pa_stream(spark, s), "fps_online_pa_",
        ["model_id", "n_updates", "feat_id", "w"],
    )
    return out.select("model_id", "n_updates", "feat_id", F.round(F.col("w"), 6).alias("w"))


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
    # NOTE: no shuffle-partition clamp here — the per-record Python SGD
    # loop is CPU-bound per key, so it wants the full task parallelism
    # (unlike the pure-JVM stateful windows, where extra state stores are
    # overhead at test scale).
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
