"""Physical-plan assertions — the 100 TB design contract (SURVEY.md §4):
filters must reach the parquet scan, small dims must broadcast, partial
aggregation must be present, and nothing may degenerate to a cartesian
product. Catching plan regressions here is the point; wall-clock is
bench.py's job."""

from __future__ import annotations

import pytest

from flink_parameter_server_spark.plans import REGISTRY
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["revenue_forecast"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_column_pruning_reaches_scan(spark):
    df = REGISTRY["revenue_forecast"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 needed columns, not all 11
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation_present(spark):
    plan = _plan(spark, "pricing_summary")
    # map-side partial + final: two HashAggregate operators
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_in_flagship(spark):
    plan = _plan(spark, "copurchase_recommend_top5")
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_window_not_pair_join(spark):
    plan = _plan(spark, "purchase_last_click_asof")
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_topk_uses_takeordered(spark):
    plan = _plan(spark, "top_unshipped_orders")
    assert "TakeOrderedAndProject" in plan
