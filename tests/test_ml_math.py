"""ML math against independent numpy references (the reference repo's
scalatest strategy, SURVEY.md §5.1: update-rule correctness on
hand-computable examples — here on seeded random batches)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_parameter_server_spark.functions.hashing import KNUTH, MOD
from flink_parameter_server_spark.ps import pa
from flink_parameter_server_spark.ps.mf import FACTOR_HI, FACTOR_LO


def _factor(idx, j, seed):
    h = ((idx + 1) * KNUTH + (j + 1) * 40503 + seed * 97) % MOD
    return FACTOR_LO + h / MOD * (FACTOR_HI - FACTOR_LO)


def _w0(f):
    return pa.W_LO + ((KNUTH + (f + 1) * 40503 + pa.W_SEED * 97) % MOD) / MOD * (pa.W_HI - pa.W_LO)


@pytest.fixture(scope="module")
def synth(spark):
    rng = random.Random(7)
    rows = [
        (i, 1.0 if rng.random() < 0.5 else -1.0, [rng.uniform(-1, 1) for _ in range(pa.N_FEATURES)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "row_id long, y double, x array<double>")
    return rows, df


def test_pa_binary_step_matches_numpy(synth):
    rows, df = synth
    got = {r.feat_id: r.w for r in pa.binary_step(df).collect()}

    w0 = [_w0(f) for f in range(pa.N_FEATURES)]
    acc = [0.0] * pa.N_FEATURES
    for _, y, x in rows:
        margin = sum(a * b for a, b in zip(x, w0))
        xn = sum(v * v for v in x)
        tau = min(pa.C, max(0.0, 1.0 - y * margin) / xn)
        for f in range(pa.N_FEATURES):
            acc[f] += tau * y * x[f]
    for f in range(pa.N_FEATURES):
        assert got[f] == pytest.approx(w0[f] + acc[f], abs=1e-9), f"feature {f}"


def test_pa_predict_sign_matches_numpy(synth):
    rows, df = synth
    got = {r.row_id: r.y_pred for r in pa.predict_binary(df.withColumn("label", F.lit(0))).collect()}
    w0 = [_w0(f) for f in range(pa.N_FEATURES)]
    for row_id, _, x in rows:
        margin = sum(a * b for a, b in zip(x, w0))
        want = (margin > 0) - (margin < 0)
        assert got[row_id] == want


def test_mf_bidirectional_training_reduces_rmse(spark):
    """Convergence sanity (the reference's integration-test strategy,
    SURVEY §5.1): two bidirectional epochs must reduce training RMSE
    versus the deterministic init."""
    from flink_parameter_server_spark.ps import mf
    from tests.conftest import SF_SMALL

    r = mf.ratings(spark, SF_SMALL)
    rows = [(x.user, x.item, x.rating) for x in r.collect()]
    trained = mf.train_bidirectional(spark, r, epochs=2)
    vecs = {"user": {}, "item": {}}
    for x in trained.collect():
        vecs[x.side].setdefault(x.id, [0.0] * mf.K)[x.dim] = x.v

    def rmse(user_f, item_f):
        se = 0.0
        for u, i, rating in rows:
            uv = user_f(u)
            iv = item_f(i)
            e = rating - sum(a * b for a, b in zip(uv, iv))
            se += e * e
        return (se / len(rows)) ** 0.5

    def init_u(u):
        return [_factor(u, j, mf.USER_SEED) for j in range(mf.K)]

    def init_i(i):
        return [_factor(i, j, mf.ITEM_SEED) for j in range(mf.K)]

    before = rmse(init_u, init_i)
    after = rmse(lambda u: vecs["user"][u], lambda i: vecs["item"][i])
    assert after < before, f"rmse {before} -> {after} did not improve"


def test_pa_multiclass_step_untouched_cells_keep_init(spark):
    df = spark.createDataFrame(
        [(0, 3, [0.1] * pa.N_FEATURES)], "row_id long, label long, x array<double>"
    )
    out = pa.multiclass_step(df)
    assert out.count() == pa.N_CLASSES * pa.N_FEATURES
    # classes other than the true one and the single violator are untouched
    touched = (
        out.withColumn(
            "init",
            F.lit(None).cast("double"),
        )
        .collect()
    )
    by_class = {}
    for r in touched:
        init = pa.W_LO + (((r.class_id + 1) * KNUTH + (r.feat_id + 1) * 40503 + pa.W_SEED * 97) % MOD) / MOD * (
            pa.W_HI - pa.W_LO
        )
        by_class.setdefault(r.class_id, []).append(abs(r.w - init) > 1e-12)
    changed_classes = [c for c, flags in by_class.items() if any(flags)]
    assert len(changed_classes) == 2 and 3 in changed_classes


def test_doc_quality_filter_learns(spark):
    """The r8 model-based quality filter (pa.doc_quality_filter): one
    PA-I batch step on weak structural labels must IMPROVE weak-label
    agreement over the init weights (0.904 vs 0.866 measured on the
    sf0.001 fixture) — i.e. the train-then-score pipeline actually
    learns, it does not just rename predict_binary. Also pins the
    feature contract: x is a 64-dim tf vector summing to ~1."""
    from pyspark.sql import functions as F

    from flink_parameter_server_spark.ps import pa
    from tests.conftest import SF_SMALL

    inst = pa.doc_quality_instances(spark, SF_SMALL)
    row = inst.select(
        F.size("x").alias("d"),
        F.round(F.aggregate("x", F.lit(0.0), lambda a, b: a + b), 6).alias("s"),
    ).first()
    assert row["d"] == pa.N_FEATURES and abs(row["s"] - 1.0) < 1e-6

    def acc(df):
        return df.where(F.col("y") == F.col("y_pred")).count() / df.count()

    a_init = acc(pa.predict_binary(inst))
    a_trained = acc(pa.doc_quality_filter(spark, SF_SMALL))
    assert a_trained > a_init, (a_trained, a_init)
    assert a_trained >= 0.88
