"""Run every registered query against its DuckDB oracle — the local
mirror of the driver's t2 gate (sf0.001 here for speed; driver uses
sf0.01; test_oracle_parity_sf001 exists to catch size-dependent bugs)."""

from __future__ import annotations

import pytest

from flink_parameter_server_spark.plans import REGISTRY
from tests.conftest import SF_SMALL, register_duck_views
from tests.oracle import compare


def _specs():
    return [pytest.param(s, id=name) for name, s in sorted(REGISTRY.items())]


@pytest.mark.parametrize("spec", _specs())
def test_query_matches_oracle(spark, duck, spec):
    register_duck_views(duck, SF_SMALL)
    df = spec.fn(spark, SF_SMALL)
    assert df is not None
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        n = df.count()
        assert n >= 0
        return
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{spec.name}: {msg}"
