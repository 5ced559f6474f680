"""Every registered query must hash-match its DuckDB oracle (driver gate
replica). Runs at sf0.001 for speed; the driver runs sf0.01."""

from __future__ import annotations

import pytest

from iotgp_func_raw_data_ingest_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare

SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    ok, msg = compare(df, ORACLES[name], SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """Coverage pin: every registered query is DuckDB-oracle-gated (true
    since r8 — zero rows-only checks remain). If this fires, either add
    the oracle for the new query or consciously re-introduce a
    rows-only parametrized check for the genuinely non-SQL-expressible
    case and list it here."""
    assert ROWS_ONLY == [], f"queries without oracles: {ROWS_ONLY}"
