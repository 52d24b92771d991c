"""Registry contract guards (plans/registry.py).

The driver's correctness window verifies only the first MAX_ENTRIES
queries alphabetically; round 2 shipped 82 entries and silently lost
coverage for 32 of them. The cap raises at import/registration time so
entry #51 can never exist — these tests guard the guard.
"""

import pytest

from flink_parameter_server_spark.plans import REGISTRY
from flink_parameter_server_spark.plans.registry import MAX_ENTRIES, register


def test_registry_exactly_at_cap():
    # Full import leaves the registry at the driver-verified maximum; a
    # count below 50 means an entry was dropped, above is impossible.
    assert len(REGISTRY) == MAX_ENTRIES == 50


def test_registration_past_cap_raises():
    with pytest.raises(ValueError, match=r"registry cap exceeded.*MAX_ENTRIES=50"):
        register("entry_51_must_not_exist", oracle=None)(lambda spark, sf_dir: None)
    assert "entry_51_must_not_exist" not in REGISTRY


def test_duplicate_name_raises():
    existing = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate query name"):
        register(existing, oracle=None)(lambda spark, sf_dir: None)


def test_every_entry_has_fn_and_doc():
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.doc.strip(), f"{name} has no docstring/doc"


def test_registry_run_leaves_no_persistent_storage(spark):
    """VERDICT r4 task #3 done-bar: run the registry end-to-end and assert
    no persisted blocks survive. Each entry releases its predecessor's
    scratch on entry (bounding live storage to ONE query's intermediates);
    the final release() empties the rest. Runs at sf0.001 to keep the
    suite fast — the storage contract is scale-independent."""
    from flink_parameter_server_spark import scratch
    from tests.conftest import SF_SMALL

    scratch.release()  # start clean of earlier tests' tracked scratch
    baseline = scratch.persistent_rdd_ids(spark)  # non-registry leftovers
    for name, spec in REGISTRY.items():
        spec.fn(spark, SF_SMALL).count()
        # live handles stay bounded by ONE query's intermediates (the
        # multi-trainer entries track ~a dozen) — 50 queries' worth of
        # accumulation would blow straight through this tripwire
        assert len(scratch._CACHED) + len(scratch._CHECKPOINT_HANDLES) <= 24, name
    scratch.release()
    leaked = scratch.persistent_rdd_ids(spark) - baseline
    assert leaked == set(), f"persisted RDDs leaked by registry run: {leaked}"
