"""The driver checks the FIRST 50 registry entries per round;
plans/__init__._reorder computes that window from committed
CORRECTNESS_r*.json history. A regression here silently wastes a round,
so the ordering contract is pinned against the committed history."""

from __future__ import annotations

import json
import re
from pathlib import Path

from iotgp_func_raw_data_ingest_spark.plans import ORACLES, QUERIES

ROOT = Path(__file__).resolve().parents[1]


def _green_anywhere() -> set[str]:
    green = set()
    for path in ROOT.glob("CORRECTNESS_r*.json"):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                green.add(name)
    return green


def test_registry_is_complete_and_oracle_covered():
    assert len(QUERIES) >= 170
    assert set(ORACLES) == set(QUERIES)  # every query is hash-checkable
    nums = sorted(int(re.match(r"q(\d+)", n).group(1)) for n in QUERIES)
    assert nums == list(range(1, len(QUERIES) + 1))  # dense, no gaps


def test_never_green_queries_lead_the_window():
    order = list(QUERIES)
    green = _green_anywhere()
    never_green = {n for n in QUERIES if n not in green}
    window = set(order[:50])
    # every never-green query fits in (and therefore leads) the 50-query
    # driver window; if this tranche ever outgrows 50 the build must
    # split it across rounds instead of silently truncating
    assert len(never_green) <= 50
    assert never_green <= window


def test_ordering_is_deterministic():
    # dict insertion order is the contract — two imports agree
    assert list(QUERIES) == sorted(QUERIES, key=list(QUERIES).index)
    assert list(ORACLES)[:50] == [n for n in QUERIES if n in ORACLES][:50]


def _latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_all_green_era_window_is_the_50_stalest():
    """Post-completion semantics: once every query has a driver-green
    row, the whole window is bucket 4 (least-recently-verified first) —
    the 50 entries whose LATEST green is oldest, name-ordered within a
    round. Pinned so a future _reorder edit can't silently stop rotating
    stale evidence back under the driver's gate."""
    latest = _latest_green_round()
    green_names = [n for n in QUERIES if latest.get(n, 0) > 0]
    if len(green_names) < len(QUERIES):
        import pytest

        pytest.skip("not in the all-green era on this checkout")
    expected = sorted(QUERIES, key=lambda n: (latest[n], n))[:50]
    assert list(QUERIES)[:50] == expected


def test_new_query_preempts_verified_entries():
    """A hypothetical next-tranche registration (no green row anywhere)
    must land inside the 50-query window ahead of every already-verified
    entry — adding coverage late in a round may never be invisible to
    the driver's gate."""
    from iotgp_func_raw_data_ingest_spark import plans

    fake = "q999_hypothetical_new_query"
    assert fake not in QUERIES
    QUERIES[fake] = lambda spark, sf_dir: None
    ORACLES[fake] = "SELECT 1 AS one"
    try:
        plans._reorder()
        assert fake in list(QUERIES)[:50]
    finally:
        del QUERIES[fake]
        del ORACLES[fake]
        plans._reorder()  # restore the committed ordering
    assert fake not in QUERIES
