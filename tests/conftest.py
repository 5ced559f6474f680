"""Shared test fixtures: one SparkSession per test run."""

from __future__ import annotations

import pytest

from iotgp_func_raw_data_ingest_spark.config import EngineConfig
from iotgp_func_raw_data_ingest_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(shuffle_partitions=8)
    s = get_spark("iotgp-tests", config=cfg, master="local[8]")
    yield s
