"""Bench-series integrity, one level above the stdout contract
(VERDICT r10 task #6): every committed ``BENCH_r{N}.json`` at HEAD must
carry a parseable summary, so a future null parse (the r9 failure mode)
or registry drift fails CI instead of waiting for a judge.

Rounds 1, 7 and 9 predate the fix chain (r1: single oversized JSON line
truncated by the driver's tail capture; r7/r9: post-JSON teardown logs)
and are immutable committed history — they are allowlisted by number,
and the allowlist is CLOSED: any new artifact must parse.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Closed historical allowlist — never extend for a new round.
KNOWN_NULL_ROUNDS = {1, 7, 9}


def _artifacts() -> dict[int, dict]:
    out: dict[int, dict] = {}
    for p in sorted(REPO.glob("BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            out[int(m.group(1))] = json.loads(p.read_text())
    return out


def test_artifacts_exist():
    arts = _artifacts()
    assert arts, "no committed BENCH_r{N}.json artifacts found"
    # contiguous round numbering from 1
    assert sorted(arts) == list(range(1, max(arts) + 1))


def test_every_nonhistorical_artifact_parses():
    for n, art in _artifacts().items():
        if n in KNOWN_NULL_ROUNDS:
            continue
        parsed = art.get("parsed")
        assert parsed is not None, (
            f"BENCH_r{n:02d}.json has parsed=null — the driver's tail "
            f"parse failed; bench.py's stdout contract regressed"
        )
        assert parsed.get("metric") == "all_queries_wall"
        assert parsed.get("n_queries", 0) > 0
        assert parsed.get("value", 0) > 0


def test_registry_size_never_shrinks_across_rounds():
    arts = _artifacts()
    sizes = [
        (n, arts[n]["parsed"]["n_queries"])
        for n in sorted(arts)
        if n not in KNOWN_NULL_ROUNDS and arts[n].get("parsed")
    ]
    for (n0, s0), (n1, s1) in zip(sizes, sizes[1:]):
        assert s1 >= s0, f"registry shrank between r{n0} ({s0}) and r{n1} ({s1})"


def test_latest_artifact_consistent_with_registry():
    """The newest committed bench point can never claim MORE queries
    than the registry at HEAD (the registry only grows mid-round)."""
    from cdc_extractor_spark.queries import QUERIES

    arts = _artifacts()
    latest = max(n for n in arts if n not in KNOWN_NULL_ROUNDS and arts[n].get("parsed"))
    assert arts[latest]["parsed"]["n_queries"] <= len(QUERIES)


@pytest.mark.parametrize("n", sorted(KNOWN_NULL_ROUNDS))
def test_allowlist_matches_history(n):
    """If a historical artifact is ever regenerated parseable, shrink
    the allowlist rather than let it mask a new failure."""
    arts = _artifacts()
    if n in arts:
        assert arts[n].get("parsed") is None, (
            f"BENCH_r{n:02d}.json now parses — remove {n} from "
            f"KNOWN_NULL_ROUNDS"
        )
