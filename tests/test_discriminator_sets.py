"""Guard against half-landed discriminated entries (VERDICT r7 #2).

Failure class with two observed instances (r7 `train_test_split`:
oracle grew `packed`/`mixture` parts while the Spark fn still returned
only split_all+curated): a multi-part entry's ORACLE declares
discriminator values the Spark fn does not produce (or vice versa),
so the driver's hash gate goes red on a feature that is half prose.

This test compares the DISTINCT value sets of every discriminator
column (part / op / sketch / method / strategy / kind / stage) between
the Spark result and the DuckDB oracle for each oracle-backed entry,
at sf0.001. It is cheaper than full value parity and — unlike the
hash compare — names the exact missing/extra discriminator value, so
a half-landed part fails with an actionable message rather than a
row-count mismatch.
"""

from __future__ import annotations

import pytest

from flink_parameter_server_spark.plans import REGISTRY
from tests.conftest import SF_SMALL, register_duck_views

DISCRIMINATORS = ("part", "op", "sketch", "method", "strategy", "kind", "stage", "task")


def _discriminated_specs():
    """Entries whose Spark schema includes a discriminator column.

    Schema inspection is lazy (no job runs), so probing every entry is
    cheap; only matching entries execute anything.
    """
    out = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        # train_test_split's discriminator check re-runs the full
        # curation pipeline (~70 s) and its parts are already covered
        # by the sf0.01 oracle-parity gate — slow-marked (r16, the
        # verify-window split)
        marks = (pytest.mark.slow,) if name == "train_test_split" else ()
        out.append(pytest.param(spec, id=name, marks=marks))
    return out


@pytest.mark.parametrize("spec", _discriminated_specs())
def test_discriminator_sets_match_oracle(spark, duck, spec):
    df = spec.fn(spark, SF_SMALL)
    disc_cols = [c for c in df.columns if c.lower() in DISCRIMINATORS]
    if not disc_cols:
        pytest.skip("no discriminator column")
    register_duck_views(duck, SF_SMALL)
    for col in disc_cols:
        spark_vals = {
            r[0] for r in df.select(col).distinct().collect()
        }
        duck_vals = {
            r[0]
            for r in duck.execute(
                f"SELECT DISTINCT {col} FROM ({spec.oracle}) q"
            ).fetchall()
        }
        assert spark_vals == duck_vals, (
            f"{spec.name}.{col}: spark-only={sorted(map(str, spark_vals - duck_vals))} "
            f"oracle-only={sorted(map(str, duck_vals - spark_vals))}"
        )
