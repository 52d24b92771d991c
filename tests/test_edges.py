"""Edge-case behavior of the generic operator APIs: empty sides, tolerance
bounds, empty pushes — the inputs a 100 TB pipeline will eventually feed
them."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_parameter_server_spark.operators.asof import asof_join
from flink_parameter_server_spark.ps.kernel import BatchParameterServer


def _events(spark, rows):
    rows = [(e, u, datetime.fromisoformat(ts)) for e, u, ts in rows]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_asof_join_empty_right_side(spark):
    left = _events(spark, [(1, 10, "2024-01-01 12:00:00"), (2, 10, "2024-01-01 13:00:00")])
    right = _events(spark, []).where(F.lit(False))
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts", right_payload=["event_id"])
    rows = out.orderBy("event_id").collect()
    assert len(rows) == 2
    assert all(r.asof_event_id is None and r.asof_ts_us is None for r in rows)


def test_asof_join_tolerance_drops_stale_matches(spark):
    left = _events(spark, [(1, 10, "2024-01-01 12:00:00")])
    right = _events(spark, [(100, 10, "2024-01-01 09:00:00")])  # 3h earlier
    close = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id"], tolerance_us=4 * 3600 * 1_000_000,
    ).first()
    stale = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id"], tolerance_us=1 * 3600 * 1_000_000,
    ).first()
    assert close.asof_event_id == 100
    assert stale.asof_event_id is None


def test_asof_join_inclusive_same_timestamp(spark):
    ts = "2024-01-01 12:00:00"
    left = _events(spark, [(1, 10, ts)])
    right = _events(spark, [(100, 10, ts)])
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts", right_payload=["event_id"]).first()
    assert out.asof_event_id == 100  # <= semantics, like DuckDB ASOF


def test_ps_push_empty_deltas_is_noop(spark):
    ps = BatchParameterServer(init_fn=lambda pid: F.array(pid.cast("double")))
    ps.push(spark.createDataFrame([(1, [2.0])], "param_id long, delta array<double>"))
    before = {r.param_id: r.value for r in ps.params.collect()}
    empty = spark.createDataFrame([], "param_id long, delta array<double>")
    ps.push(empty)
    after = {r.param_id: r.value for r in ps.params.collect()}
    assert before == after


def test_udf_surface_demo_runs(spark):
    """D22 surface (formerly the rows-only registry entry
    udf_surface_demo): pandas_udf + row UDF + Python UDTF compose and
    produce sane output."""
    from flink_parameter_server_spark.operators.relational2 import udf_surface_demo
    from tests.conftest import SF_SMALL

    rows = udf_surface_demo(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(r.n_toks > 0 and r.n_events == 100 for r in rows)


def test_scoped_checkpoint_exact_attribution_concurrent(spark):
    """r15: scoped_checkpoint attributes checkpoint blocks by reading
    the LogicalRDD id off the returned plan (no global diff, no lock
    around materialization). Two concurrent checkpoints must each claim
    exactly their own RDD id, and freeing one must leave the other's
    blocks (and data) alive."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from flink_parameter_server_spark.scratch import (
        persistent_rdd_ids,
        scoped_checkpoint,
        unpersist_rdd_ids,
    )

    def ckpt(tag):
        ids: set[int] = set()
        df = spark.range(0, 50_000).selectExpr("id", f"id * {tag} as v")
        out = scoped_checkpoint(df, ids)
        return out, ids

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(inheritable_thread_target(ckpt), 3)
        f2 = pool.submit(inheritable_thread_target(ckpt), 7)
        out1, ids1 = f1.result()
        out2, ids2 = f2.result()

    # each call claimed exactly one id, they differ, and both are live
    assert len(ids1) == 1 and len(ids2) == 1 and ids1 != ids2
    live = persistent_rdd_ids(spark)
    assert ids1 <= live and ids2 <= live
    # freeing one must not touch the other: its blocks stay persisted
    # and its (lineage-truncated) data remains readable
    unpersist_rdd_ids(spark, ids1)
    assert ids2 <= persistent_rdd_ids(spark)
    assert out2.count() == 50_000
    unpersist_rdd_ids(spark, ids2)
