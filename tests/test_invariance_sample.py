"""CI'd rotating invariance sample (VERDICT r7 task #3).

Round 7 ran two one-off full-registry sweeps (~15 min each, SCALE.md):
every query under the driver's pristine session confs, and every query
under ``spark.sql.shuffle.partitions=7``.  The first axis is already in
CI permanently (tests/test_driver_session.py re-runs the full parity
suite under simulated driver confs every time); the second is in CI
only for the hand-curated SENSITIVE list (test_partition_invariance.py)
— queries NOT on that list were certified layout-invariant once, in r7,
and nothing would catch a later regression.

This module closes that hole with a deterministic ROTATING sample: each
round, ~SAMPLE_SIZE registry queries — keyed on the round number, so
the subset changes every round and coverage accumulates — are re-run
under the harshest combination of both axes at once: pristine driver
session confs AND shuffle.partitions=7.  The selection is a pure
function of (round, name) via md5, so a given round's sample is
reproducible in review, and two consecutive rounds' samples provably
differ (pinned below).

The round number is derived from the committed CORRECTNESS_r*.json
artifacts (max round + 1 = the round being built), so rotation needs no
manual bump.
"""

from __future__ import annotations

import hashlib
import re
import subprocess
from pathlib import Path

import pytest

from tests.oracle_check import compare, duckdb_conn
from tests.test_partition_invariance import SENSITIVE

SAMPLE_SIZE = 20


def current_round() -> int:
    repo = Path(__file__).parent.parent
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    rounds = [int(m.group(1)) for m in re.finditer(r"CORRECTNESS_r(\d+)\.json", out)]
    return (max(rounds) if rounds else 0) + 1


def sample_for_round(rnd: int) -> list[str]:
    """The ~SAMPLE_SIZE oracled queries with the smallest
    md5(f"{rnd}:{name}") — deterministic per round, rotating across
    rounds.  SENSITIVE names are excluded (they already run at
    shuffle=7 every round, unsampled)."""
    from cdc_extractor_spark.queries import ORACLES

    pool = sorted(set(ORACLES) - set(SENSITIVE))
    keyed = sorted(
        pool, key=lambda n: hashlib.md5(f"{rnd}:{n}".encode()).hexdigest()
    )
    return sorted(keyed[:SAMPLE_SIZE])


def test_rotation_actually_rotates():
    rnd = current_round()
    here = set(sample_for_round(rnd))
    prev = set(sample_for_round(rnd - 1))
    nxt = set(sample_for_round(rnd + 1))
    assert here != prev and here != nxt, (
        "rotating sample must differ between consecutive rounds"
    )


@pytest.fixture(scope="module")
def harsh_spark(spark):
    """Driver-pristine confs + adversarial shuffle partitioning, both
    at once: unset every session.py runtime conf (true Spark defaults,
    as in test_driver_session) and then force shuffle.partitions=7."""
    from cdc_extractor_spark.session import runtime_sql_confs

    keys = sorted(runtime_sql_confs())
    saved = {k: spark.conf.get(k) for k in keys}
    for k in keys:
        spark.conf.unset(k)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sample_for_round(current_round()))
def test_sampled_query_invariant_under_harsh_session(
    harsh_spark, sf_dir, con, name
):
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](harsh_spark, sf_dir)
    compare(df, con, ORACLES[name], name)
