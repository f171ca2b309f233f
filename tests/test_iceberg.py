"""Iceberg hadoop-catalog round-trip — auto-activates on clusters that
ship the Iceberg Spark runtime jar; skipped in this container (no jar,
no network — see the manual checklist in COVERAGE.md).

The engine's only Iceberg-specific line is ``spark.read.table`` inside
``sources/catalog.load_table``; everything downstream is
format-agnostic DataFrame code, so this test pins exactly the three
integration seams: catalog detection, snapshot lineage for checkpoint
identity, and scan-level pruning through DataSource V2.
"""

import pytest


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip("Iceberg Spark runtime jar not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.it_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_test.warehouse", str(tmp_path / "wh"))
    yield "it_test"
    spark.sql("DROP TABLE IF EXISTS it_test.db.docs")


class TestIcebergRoundTrip:
    def test_catalog_detected_write_read_prune(self, spark, iceberg_catalog):
        from heavykeeper_rs_spark.sources.catalog import (
            iceberg_available,
            snapshot_lineage,
        )

        assert iceberg_available(spark)
        spark.sql(
            "CREATE TABLE it_test.db.docs (doc_id BIGINT, lang STRING, "
            "text STRING) USING iceberg PARTITIONED BY (lang)"
        )
        spark.sql(
            "INSERT INTO it_test.db.docs VALUES "
            "(1, 'en', 'hello world'), (2, 'de', 'hallo welt'), "
            "(3, 'en', 'more text')"
        )
        df = spark.read.table("it_test.db.docs")
        assert df.count() == 3
        # partition pruning must reach the Iceberg scan (DSv2 shows the
        # pushed partition filter in the scan description)
        plan = (
            df.filter("lang = 'en'")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "lang" in plan
        assert df.filter("lang = 'en'").count() == 2
        # snapshot lineage: advancing the table changes the token
        tok1 = snapshot_lineage(spark, "it_test.db.docs")
        spark.sql("INSERT INTO it_test.db.docs VALUES (4, 'en', 'x')")
        tok2 = snapshot_lineage(spark, "it_test.db.docs")
        assert tok1 != tok2
