"""Driver-window partition invariant + stale-credit detection
(VERDICT r6 tasks #5 and #7, pinned in code instead of prose).

Three mechanical rules:

1. PARTITION: every registered query is either driver-green (per the
   committed CORRECTNESS_r*.json artifacts) or inside
   DRIVER_WINDOW/SECOND_TIER — no query can sit outside both (an
   unverifiable tail cannot form).
2. RE-PIN LEDGER: a windowed name that already has driver-green credit
   must carry an explicit REPINS justification (stale-credit
   re-certification is deliberate, never accidental), and vice versa.
3. FINGERPRINTS: a driver-green query NOT in the window keeps its
   credit only while every helper function/class/constant reachable
   from its query function — and its oracle SQL — is byte-identical
   to the committed freeze baseline (tests/helper_fingerprints.json).
   Any drift forces the query into the window or the baseline
   regeneration forces an explicit decision at review time.

Regenerate the baseline at each round's window freeze:
``python -m tests.helper_graph --write``.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _driver_green() -> set[str]:
    green: set[str] = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(f)).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                green.add(name)
    return green


def test_every_query_green_or_windowed():
    from cdc_extractor_spark.queries import (
        DRIVER_WINDOW,
        QUERIES,
        SECOND_TIER,
    )

    green = _driver_green()
    windowed = set(DRIVER_WINDOW) | set(SECOND_TIER)
    orphans = sorted(set(QUERIES) - green - windowed)
    assert not orphans, (
        "queries with neither driver-green credit nor a window slot "
        f"(unverifiable tail): {orphans}"
    )


def test_repin_ledger_is_exact():
    from cdc_extractor_spark.queries import DRIVER_WINDOW, REPINS

    green = _driver_green()
    repinned = set(DRIVER_WINDOW) & green
    assert repinned == set(REPINS), (
        "window/green overlap must exactly match the REPINS ledger; "
        f"undocumented re-pins: {sorted(repinned - set(REPINS))}; "
        f"ledger entries not green/windowed: {sorted(set(REPINS) - repinned)}"
    )


def test_window_is_driver_sized():
    from cdc_extractor_spark.queries import DRIVER_WINDOW, ORACLES

    assert len(DRIVER_WINDOW) == 50
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, (
        f"window names without a full-hash oracle: {unoracled}"
    )


@pytest.fixture(scope="module")
def baseline():
    from tests.helper_graph import BASELINE

    if not BASELINE.exists():
        pytest.fail(
            "tests/helper_fingerprints.json missing — regenerate at the "
            "window freeze with `python -m tests.helper_graph --write`"
        )
    return json.loads(BASELINE.read_text())


@pytest.fixture(scope="module")
def current():
    from tests.helper_graph import snapshot

    return snapshot()


def test_green_credit_requires_unchanged_helpers(baseline, current):
    """Any node whose source drifted since the freeze invalidates the
    driver-green credit of every query that reaches it — those queries
    must be in DRIVER_WINDOW (fresh certification) for the suite to
    stay green.  New nodes are fine (appends don't touch credit);
    DELETED nodes count as drift for their dependents."""
    from cdc_extractor_spark.queries import DRIVER_WINDOW, SECOND_TIER

    green = _driver_green()
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
    # see it via the queries-module alias scan
    assert any(
        "sources.pyds" in n
        for n in reach["source_python_datasource_scan"]
    ), "local `from .sources import pyds` imports must create edges"
