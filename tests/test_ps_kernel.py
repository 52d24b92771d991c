"""Unit tests for the PS kernel (SURVEY.md §5.1 analog of the reference's
scalatest suite: pull/push/fold correctness on hand-computed examples,
plus the transformWithModelLoad roundtrip)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_parameter_server_spark.ps.kernel import BatchParameterServer


def _init_fn(pid):
    # value(id) = [id*1.0, id*2.0] — easy to hand-compute
    return F.array(pid.cast("double"), pid.cast("double") * 2)


def test_pull_lazy_init(spark):
    ps = BatchParameterServer(init_fn=_init_fn)
    keys = spark.createDataFrame([(1,), (3,)], ["param_id"])
    got = {r.param_id: r.value for r in ps.pull(keys).collect()}
    assert got == {1: [1.0, 2.0], 3: [3.0, 6.0]}


def test_push_folds_additively(spark):
    ps = BatchParameterServer(init_fn=_init_fn)
    deltas = spark.createDataFrame(
        [(1, [0.5, 0.5]), (1, [0.25, 0.0]), (2, [1.0, -1.0])], ["param_id", "delta"]
    )
    ps.push(deltas)
    got = {r.param_id: r.value for r in ps.params.collect()}
    # two pushes to key 1 combine (0.75, 0.5) onto init (1, 2)
    assert got[1] == [1.75, 2.5]
    assert got[2] == [3.0, 3.0]  # init(2,4) + (1,-1)


def test_second_push_merges_with_existing_state(spark):
    ps = BatchParameterServer(init_fn=_init_fn)
    ps.push(spark.createDataFrame([(1, [1.0, 1.0])], ["param_id", "delta"]))
    ps.push(spark.createDataFrame([(1, [0.5, 0.0]), (2, [0.1, 0.1])], ["param_id", "delta"]))
    got = {r.param_id: r.value for r in ps.params.collect()}
    assert got[1] == [2.5, 3.0]  # init(1,2) + (1,1) + (0.5,0)
    assert got[2] == [2.1, 4.1]  # lazy init on second push


def test_iterate_runs_epochs(spark):
    ps = BatchParameterServer(init_fn=_init_fn)
    data = spark.createDataFrame([(1,), (1,), (2,)], ["param_id"])

    def step(d, server):
        pulled = server.pull(d)
        return pulled.select("param_id", F.transform("value", lambda x: F.lit(0.0) * x + 1.0).alias("delta"))

    model = ps.iterate(data, step, epochs=2)
    got = {r.param_id: r.value for r in model.collect()}
    # key 1 appears twice per epoch -> +2 per dim per epoch; key 2 once -> +1
    assert got[1] == [5.0, 6.0]
    assert got[2] == [4.0, 6.0]


def test_model_dump_load_roundtrip(spark):
    """A6 transformWithModelLoad: dump, load, keep training."""
    ps = BatchParameterServer(init_fn=_init_fn)
    ps.push(spark.createDataFrame([(7, [1.0, 1.0])], ["param_id", "delta"]))
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/model"
        ps.params.write.parquet(path)
        ps2 = BatchParameterServer.load(spark, path, init_fn=_init_fn)
        ps2.push(spark.createDataFrame([(7, [0.5, 0.5]), (8, [0.0, 1.0])], ["param_id", "delta"]))
        got = {r.param_id: r.value for r in ps2.params.collect()}
    assert got[7] == [8.5, 15.5]  # init(7,14) + (1,1) + (0.5,0.5)
    assert got[8] == [8.0, 17.0]  # lazy init after load


def test_bidirectional_trainer_checkpoints_every_epoch(spark):
    """Perf contract (r6): train_bidirectional's per-epoch plan references
    the prior params in three places (two pulls + the merge join), so
    without a per-epoch lineage cut the optimizer re-expands hundreds of
    join subtrees (measured ~450 joins / 9.4s for 2 epochs at sf0.1;
    ~2.9s with the cut). Pin both the cadence and its observable effect:
    the final model's physical plan must read a checkpointed RDD scan,
    not the full two-epoch join lineage."""
    from flink_parameter_server_spark.ps import mf
    from tests.conftest import SF_SMALL

    ratings = mf.ratings(spark, SF_SMALL)
    model = mf.train_bidirectional(spark, ratings, epochs=2)
    plan = model._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan  # localCheckpoint-backed params
    # the epoch joins are behind the checkpoint cut, not in this plan
    assert plan.count("Join") == 0
