"""Cluster-spec evolution: set_cluster_spec is a metadata-only commit that
drives zorder_by defaults and invalidates incremental skipping across spec
generations (the Z-order analog of bucket-spec evolution)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import zorder_by
from ecommerce_lakehouse_spark.table import IcehouseTable


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 400, seed=61, partitions=4)
    return IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_set_cluster_spec_records_properties_and_generation(spark, table):
    assert table.cluster_spec() == {"spec_id": 0, "extra_cols": []}
    snap = table.set_cluster_spec(
        curve="hilbert", url_coord="prefix", extra_cols=["lang"]
    )
    assert snap.operation == "set-spec"
    spec = table.cluster_spec()
    assert spec["spec_id"] == 1
    assert spec["curve"] == "hilbert"
    assert spec["url_coord"] == "prefix"
    assert spec["extra_cols"] == ["lang"]
    # evolving again bumps the generation
    table.set_cluster_spec(curve="morton")
    assert table.cluster_spec()["spec_id"] == 2
    assert table.cluster_spec()["extra_cols"] == []


def test_set_cluster_spec_validates(spark, table):
    with pytest.raises(ValueError, match="curve"):
        table.set_cluster_spec(curve="peano")
    with pytest.raises(ValueError, match="not a table column"):
        table.set_cluster_spec(extra_cols=["nope"])


def test_zorder_defaults_from_spec(spark, table):
    table.set_cluster_spec(curve="hilbert")
    snap = zorder_by(table, target_file_bytes=512 * 1024)
    assert snap.operation == "cluster-hilbert"
    assert snap.summary["cluster_spec_id"] == 1
    # explicit args still override the spec
    snap2 = zorder_by(table, curve="morton", target_file_bytes=512 * 1024)
    assert snap2.operation == "cluster-morton"


def test_spec_evolution_invalidates_incremental(spark, table):
    n_before = table.scan().count()
    # generation 0: cluster everything, then append — incremental touches
    # only the new lineage
    s1 = zorder_by(table, scope="incremental", target_file_bytes=512 * 1024)
    assert s1.summary["cluster_files_in"] == 4
    table.append(generate_pages(spark, 100, seed=62, partitions=2))
    s2 = zorder_by(table, scope="incremental", target_file_bytes=512 * 1024)
    assert s2.summary["cluster_files_in"] == 2  # the appended files only
    n_clustered = s1.summary["cluster_files_out"] + s2.summary["cluster_files_out"]
    # spec evolution: the whole table is unclustered w.r.t. generation 1,
    # so the next incremental run rewrites every live file ...
    table.set_cluster_spec(curve="hilbert", url_coord="prefix")
    s3 = zorder_by(table, scope="incremental", target_file_bytes=512 * 1024)
    assert s3.summary["cluster_files_in"] == n_clustered
    assert s3.summary["cluster_spec_id"] == 1
    # ... and the one after is O(new data) again under the new generation
    table.append(generate_pages(spark, 50, seed=63, partitions=1))
    s4 = zorder_by(table, scope="incremental", target_file_bytes=512 * 1024)
    assert s4.summary["cluster_files_in"] == 1
    # clustering only relocates rows: the row set never changes
    assert table.scan().count() == n_before + 150
    assert table.scan().filter(F.col("url").isNull()).count() == 0
