"""Registry invariants: the correctness-gate ordering contract.

The driver verifies only the first ~50 registry entries per round, so
these invariants ARE the coverage guarantee — a future module reorder
or id rename that silently drops a contract id out of the cap fails
here, not in the next round's verdict."""

from __future__ import annotations

from flink_kafka_replicator_spark import registry


def test_contract_ids_all_registered_and_inside_cap():
    qs = list(registry.all_queries())
    missing = set(registry.CONTRACT_IDS) - set(qs)
    assert not missing, f"contract ids not registered: {missing}"
    out_of_cap = set(registry.CONTRACT_IDS) - set(qs[:50])
    assert not out_of_cap, f"contract ids past the driver cap: {out_of_cap}"


def test_priority_extension_ids_exist():
    qs = set(registry.all_queries())
    stale = set(registry.PRIORITY_EXTENSION_IDS) - qs
    assert not stale, f"priority list references unknown ids: {stale}"


def test_oracles_subset_of_queries_and_same_order():
    qs = list(registry.all_queries())
    os_ = list(registry.all_oracles())
    assert set(os_) <= set(qs)
    # the driver iterates queries(); oracles must follow the same
    # priority order so the cap covers matched pairs
    pos = {q: i for i, q in enumerate(qs)}
    assert os_ == sorted(os_, key=lambda q: pos[q])


def test_unverified_ids_outrank_verified_extensions():
    """Any id with no CORRECTNESS row must sort before every verified
    non-contract id — the rotation property."""
    qs = list(registry.all_queries())
    seen = registry._driver_seen_ids()
    contract = set(registry.CONTRACT_IDS)
    tail = [q for q in qs if q not in contract]
    first_seen_idx = next(
        (i for i, q in enumerate(tail) if q in seen), len(tail)
    )
    assert all(q in seen for q in tail[first_seen_idx:]), (
        "an unverified extension sorts after a verified one"
    )
