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


class TestWriteSized:
    def test_file_count_tracks_target(self, spark, tmp_path):
        import glob

        from heavykeeper_rs_spark.sources.writer import (
            estimated_bytes,
            write_sized,
        )

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        est = estimated_bytes(li)
        assert est > 0
        # tiny target -> multiple files; huge target -> one file
        n_small = write_sized(li, str(tmp_path / "a"), target_mb=1,
                              compression_ratio=0.25)
        files_a = glob.glob(str(tmp_path / "a" / "*.parquet"))
        assert n_small > 1 and len(files_a) == n_small
        n_big = write_sized(li, str(tmp_path / "b"), target_mb=10_000)
        assert n_big == 1
        assert len(glob.glob(str(tmp_path / "b" / "*.parquet"))) == 1
        # partitioned write: directories per key, readable roundtrip
        write_sized(li, str(tmp_path / "c"), target_mb=10_000,
                    partition_by=["l_returnflag"])
        back = spark.read.parquet(str(tmp_path / "c"))
        assert back.count() == li.count()
        assert len(glob.glob(str(tmp_path / "c" / "l_returnflag=*"))) >= 2
