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
