"""Shared index-parameter stamp lifecycle (operators/stamps.py):
the write/validate matrix both committed-index writers ride on."""

import pytest

from crawler_apple_podcast_spark.operators import stamps


def _mk(spark, table, rows=((1, 0, 7),)):
    return spark.createDataFrame(list(rows), "doc_id INT, band INT, key LONG")


def _cleanup(spark, table):
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__meta")


def test_stamp_missing_key_refuses(spark):
    """A stamp that never recorded a parameter cannot vouch for it:
    probing with a key absent from the stamp raises instead of
    skipping the check (skipping would reinstate the silent-miss
    failure for writers that later grow a parameter)."""
    table = "stamp_missing_key_test"
    try:
        stamps.write_stamped_bucketed(
            _mk(spark, table), table, ("band", "key"), {"bands": 12}, 2,
            "overwrite",
        )
        with pytest.raises(ValueError, match="does not record"):
            stamps.check_stamp(spark, table, {"bands": 12, "rows_per_band": 3})
        stamps.check_stamp(spark, table, {"bands": 12})  # subset ok
    finally:
        _cleanup(spark, table)


def test_divergent_overwrite_replaces_stamp(spark):
    """Re-stamping on a parameter-changing overwrite: the old stamp is
    dropped BEFORE the data write (a crash between the two writes
    leaves the table unguarded, never wrongly vouched) and the new
    stamp lands after."""
    table = "stamp_divergent_overwrite_test"
    try:
        stamps.write_stamped_bucketed(
            _mk(spark, table), table, ("band", "key"), {"bands": 12}, 2,
            "overwrite",
        )
        stamps.write_stamped_bucketed(
            _mk(spark, table), table, ("band", "key"), {"bands": 16}, 2,
            "overwrite",
        )
        assert stamps.read_stamp(spark, table) == {"bands": 16}
        stamps.check_stamp(spark, table, {"bands": 16})
        with pytest.raises(ValueError, match="committed=16 probe=12"):
            stamps.check_stamp(spark, table, {"bands": 12})
    finally:
        _cleanup(spark, table)
