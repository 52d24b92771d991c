"""r15 optimization: load_table memoizes the lazy scan frame per
(session, sf_dir, table). The memo must return the SAME plan object for
repeated calls (that is the optimization), distinct frames across
sf_dirs and tables (correctness isolation), and the memoized frame must
keep producing live data — i.e. it is a lazy scan, not a result cache."""

from __future__ import annotations

from tests.conftest import SF_MEDIUM, SF_SMALL


def test_memo_identity_and_isolation(spark):
    from flink_parameter_server_spark.sources.tables import load_table

    a1 = load_table(spark, SF_SMALL, "customer")
    a2 = load_table(spark, SF_SMALL, "customer")
    assert a1 is a2, "repeated call must return the memoized frame"

    b = load_table(spark, SF_MEDIUM, "customer")
    assert b is not a1, "different sf_dir must not share a scan"

    c = load_table(spark, SF_SMALL, "orders")
    assert c is not a1, "different table must not share a scan"

    # the two sf_dirs really read different files
    assert a1.count() != b.count()


def test_memo_is_lazy_not_result_cache(spark):
    from flink_parameter_server_spark.sources.tables import load_table

    df = load_table(spark, SF_SMALL, "lineitem")
    n1 = df.count()
    # a second action re-executes the scan (fresh jobs, same live files);
    # equality here is the data's determinism, not a cached result
    n2 = load_table(spark, SF_SMALL, "lineitem").count()
    assert n1 == n2 > 0
    assert not df.is_cached, "memoized scan must not be persist()ed"


def test_events_ts_normalization_survives_memo(spark):
    # events carries the ts physical-type adaptation inside the memoized
    # frame; the dtype must be a session timestamp either way
    from flink_parameter_server_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert ev is load_table(spark, SF_SMALL, "events")
