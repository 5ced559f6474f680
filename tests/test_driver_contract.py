"""Driver-contract hardening probes (the verify skill's checklist):
clean failure on a bad sf_dir, and session-conf independence — the
driver owns the SparkSession, so prep() must override whatever
timezone/conf state it arrives with."""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import AnalysisException

from iotgp_func_raw_data_ingest_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare


def test_bad_sf_dir_raises_clean_analysis_exception(spark):
    with pytest.raises(AnalysisException) as exc:
        QUERIES["q01_pricing_summary"](spark, "/nonexistent/sf9.9").collect()
    assert "PATH_NOT_FOUND" in str(exc.value)


def test_prep_overrides_foreign_timezone(spark):
    # simulate a driver session arriving with a non-UTC zone: the
    # events-timestamp queries must still hash-match because prep() pins
    # UTC at build time
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        for name in ("q23_events_hourly", "q145_hourly_heatmap"):
            ok, msg = compare(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)
            assert ok, f"{name} under foreign tz: {msg}"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_prep_sets_nanos_as_long(spark):
    # the events reader depends on this legacy conf; prep() must set it
    # even if the driver's session didn't
    original = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        ok, msg = compare(
            QUERIES["q117_event_window_dedup"](spark, SF_SMOKE),
            ORACLES["q117_event_window_dedup"],
            SF_SMOKE,
        )
        assert ok, f"q117 without nanosAsLong preset: {msg}"
    finally:
        if original is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", original)


def test_streaming_queries_fail_clean_and_clean_up(spark):
    """A bad sf_dir must raise the same clean PATH_NOT_FOUND through the
    streaming gate queries, restore the pinned shuffle-partition conf,
    and leave no orphaned temp workdirs or active streams."""
    import glob

    before = set(glob.glob("/tmp/q17[789]_*") + glob.glob("/tmp/q180_*"))
    conf_before = spark.conf.get("spark.sql.shuffle.partitions")
    for name in (
        "q177_streaming_rollup",
        "q178_streaming_dedup_keys",
        "q179_streaming_ingest",
        "q180_distinct_rollup_accuracy",
    ):
        with pytest.raises(AnalysisException) as exc:
            QUERIES[name](spark, "/nonexistent/sf9.9")
        assert "PATH_NOT_FOUND" in str(exc.value)
    assert spark.conf.get("spark.sql.shuffle.partitions") == conf_before
    after = set(glob.glob("/tmp/q17[789]_*") + glob.glob("/tmp/q180_*"))
    assert after == before  # finally-blocks removed their workdirs
    assert spark.streams.active == []
