"""Driver-window partition invariant + stale-credit detection
(VERDICT r6 tasks #5 and #7, pinned in code instead of prose).

Three mechanical rules, all evaluated against the FREEZE-TIME baseline
(tests/helper_fingerprints.json, regenerated at each round's window
freeze with ``python -m tests.helper_graph --write`` — it snapshots
helper fingerprints, per-query reach, oracle hashes, AND the
driver-green credit ledger as of that freeze):

1. PARTITION: every registered query is either driver-green (per the
   frozen ledger) or inside DRIVER_WINDOW/SECOND_TIER — no query can
   sit outside both (an unverifiable tail cannot form).
2. RE-PIN LEDGER: a windowed name that already has frozen driver-green
   credit must carry an explicit REPINS justification (stale-credit
   re-certification is deliberate, never accidental), and vice versa.
3. FINGERPRINTS: a frozen-green query NOT in the window keeps its
   credit only while every helper function/class/constant reachable
   from its query function — and its oracle SQL — is byte-identical
   to the baseline.  Any drift forces the query into the window, or
   the explicit baseline regeneration forces the decision at review.

Reading credit from the baseline (not the live CORRECTNESS_r*.json
files) keeps the suite green when the NEXT round's artifact lands:
new credit takes effect only at the next freeze, which is exactly
when the window rotates.
"""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def baseline():
    from tests.helper_graph import BASELINE

    if not BASELINE.exists():
        pytest.fail(
            "tests/helper_fingerprints.json missing — regenerate at the "
            "window freeze with `python -m tests.helper_graph --write`"
        )
    snap = json.loads(BASELINE.read_text())
    assert "driver_green" in snap, (
        "stale baseline format (no driver_green ledger) — regenerate "
        "with `python -m tests.helper_graph --write`"
    )
    return snap


@pytest.fixture(scope="module")
def current():
    from tests.helper_graph import snapshot

    return snapshot()


def test_every_query_green_or_windowed(baseline):
    from cdc_extractor_spark.queries import (
        DRIVER_WINDOW,
        QUERIES,
        SECOND_TIER,
    )

    green = set(baseline["driver_green"])
    windowed = set(DRIVER_WINDOW) | set(SECOND_TIER)
    orphans = sorted(set(QUERIES) - green - windowed)
    assert not orphans, (
        "queries with neither frozen driver-green credit nor a window "
        f"slot (unverifiable tail): {orphans}"
    )


def test_repin_ledger_is_exact(baseline):
    from cdc_extractor_spark.queries import DRIVER_WINDOW, REPINS

    green = set(baseline["driver_green"])
    repinned = set(DRIVER_WINDOW) & green
    assert repinned == set(REPINS), (
        "window/frozen-green overlap must exactly match the REPINS "
        f"ledger; undocumented re-pins: {sorted(repinned - set(REPINS))}; "
        f"ledger entries not green/windowed: {sorted(set(REPINS) - repinned)}"
    )


def test_window_is_driver_sized():
    from cdc_extractor_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

    assert len(DRIVER_WINDOW) == 50
    # the driver samples the REGISTRATION-ORDER prefix — the reorder at
    # the bottom of queries.py must actually front the window
    assert tuple(list(QUERIES)[:50]) == DRIVER_WINDOW
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, (
        f"window names without a full-hash oracle: {unoracled}"
    )


def test_green_credit_requires_unchanged_helpers(baseline, current):
    """Any node whose source drifted since the freeze invalidates the
    frozen driver-green credit of every query that reaches it — those
    queries must be in DRIVER_WINDOW (fresh certification) for the
    suite to stay green.  New nodes are fine (appends don't touch
    credit); DELETED nodes count as drift for their dependents."""
    from cdc_extractor_spark.queries import DRIVER_WINDOW, SECOND_TIER

    green = set(baseline["driver_green"])
    windowed = set(DRIVER_WINDOW) | set(SECOND_TIER)
    drifted = {
        nid
        for nid, sha in baseline["nodes"].items()
        if current["nodes"].get(nid) != sha
    }
    stale = []
    for qname, reach in current["query_reach"].items():
        if qname in windowed or qname not in green:
            continue
        hit = drifted.intersection(reach)
        if hit:
            stale.append((qname, sorted(hit)[:3]))
    assert not stale, (
        "driver-green queries whose reachable helpers drifted since the "
        f"freeze — re-pin them into DRIVER_WINDOW: {stale}"
    )
    # oracle SQL drift breaks credit the same way
    stale_oracle = [
        q
        for q, sha in baseline["oracles"].items()
        if current["oracles"].get(q) != sha
        and q in green
        and q not in windowed
    ]
    assert not stale_oracle, (
        f"driver-green queries whose oracle SQL changed: {stale_oracle}"
    )


def test_fingerprint_graph_sees_known_dependencies(current):
    """Sanity of the reachability graph itself: a few known
    helper->query edges must be present, else rule 3 is vacuous."""
    reach = current["query_reach"]
    assert any(
        n.endswith(":connected_components")
        for n in reach["dedup_cluster_components"]
    )
    assert any(
        n.endswith(":snapshot_diff") for n in reach["cdc_snapshot_diff"]
    )
    assert any(
        n.endswith(":topk_cosine") for n in reach["knn_label_noise"]
    )
    assert any(n.endswith(":BASE_MS") for n in reach["cdc_snapshot_diff"])
    # pyds is imported inside the query body — the graph must still
    # see it via the function-local ImportFrom scan
    assert any(
        "sources.pyds" in n
        for n in reach["source_python_datasource_scan"]
    ), "local `from .sources import pyds` imports must create edges"
