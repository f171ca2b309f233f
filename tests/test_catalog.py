"""Catalog-aware loading: Iceberg when configured, parquet fallback here."""

import pytest

from heavykeeper_rs_spark.sources.catalog import iceberg_available, load_table


def test_no_iceberg_in_this_container(spark):
    assert iceberg_available(spark) is False


def test_parquet_fallback_loads(spark):
    df = load_table(spark, "web.events", sf_dir="/root/testdata/sf0.001")
    assert df.count() > 0
    assert "event_type" in df.columns


def test_unknown_table_and_missing_sfdir(spark):
    with pytest.raises(ValueError, match="unknown table"):
        load_table(spark, "web.nope", sf_dir="/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="sf_dir required"):
        load_table(spark, "events")
