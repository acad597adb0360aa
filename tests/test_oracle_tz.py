"""Adversarial timezone invariance for every oracle_sql() entry.

The r1/r2 driver red row (``tumbling_events``) was a TZ-sensitive ORACLE:
under a ``::TIMESTAMPTZ`` view exposure with a non-UTC TimeZone, DuckDB's
``time_bucket`` shifted every window_start by the zone offset with
identical per-window counts — rows_match=true / hash_match=false, invisible
to a naive-view default-TimeZone check. These tests run every oracle under
{naive, ::TIMESTAMPTZ} exposures x {UTC, America/New_York, Asia/Kathmandu}
(Kathmandu's +5:45 catches non-whole-hour offsets) and require the value
hash to be identical everywhere — the same differential
``scripts/check_oracle.py --adversarial`` applies pre-commit.

DuckDB-only (no Spark session): cheap enough to run on every oracle.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from scripts.check_oracle import ADV_ZONES, make_connection, value_hash

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

needs_data = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="driver testdata absent"
)


def _hash(con, sql: str) -> str:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return value_hash(cols, res.fetchall())


@needs_data
@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_tz_invariant(name):
    sql = entrymod.oracle_sql()[name]
    base = _hash(make_connection(SF_DIR), sql)
    for tstz in (False, True):
        for zone in ADV_ZONES:
            h = _hash(make_connection(SF_DIR, tstz=tstz, tz=zone), sql)
            assert h == base, (
                f"oracle {name!r} is TZ-sensitive: hash moved under "
                f"{'::TIMESTAMPTZ' if tstz else 'naive'} views with TimeZone={zone}"
            )


@needs_data
def test_harness_catches_the_r2_time_bucket_oracle():
    """Regression guard for the harness itself: the exact r2 oracle form
    must FAIL the differential, proving the adversarial exposure reproduces
    the driver's rows-true/hash-false signature."""
    old = """
        SELECT CAST(epoch(time_bucket(INTERVAL 3600 SECONDS, ts)) AS BIGINT) AS window_start,
               event_type, count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_cents
        FROM events GROUP BY 1, 2
    """
    base = _hash(make_connection(SF_DIR), old)
    moved = [
        zone
        for zone in ADV_ZONES
        if _hash(make_connection(SF_DIR, tstz=True, tz=zone), old) != base
    ]
    assert moved == ADV_ZONES, (
        "adversarial harness lost its teeth: the r2 time_bucket oracle no "
        f"longer hash-shifts under ::TIMESTAMPTZ views (moved only in {moved})"
    )
