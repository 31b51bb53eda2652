"""Avro manifest format: round trip, REAL-Avro compliance (read back via the
Java Avro library on Spark's classpath), JSONL back-compat, and in-place
migration via rewrite_manifests."""

from __future__ import annotations

import json
import os

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance import rewrite_manifests
from ecommerce_lakehouse_spark.table import IcehouseTable
from ecommerce_lakehouse_spark.table.avro_io import (
    read_manifest_avro,
    write_manifest_avro,
)

SAMPLE = [
    {
        "path": "data/0001-abc.parquet",
        "row_count": 123,
        "size_bytes": 45678,
        "added_by": 7,
        "first_row_id": 1_000_000,          # row-lineage base (v2 field)
        "stats": {"url": {"min": "https://a", "max": "https://z", "null_count": 0},
                  "warc_ts": {"min": 1700000000000000, "max": 1700009999999999}},
    },
    {
        "path": "data/0002-déf.parquet",   # non-ascii path
        "row_count": 0,
        "size_bytes": 0,
        "added_by": None,                   # null union branch
        "first_row_id": None,
        "stats": {},
    },
    {
        "path": "data/0003.parquet",
        "row_count": 2**40,                 # multi-byte varints
        "size_bytes": 2**33,
        "added_by": 1,
        "first_row_id": 2**41,              # multi-byte varint in the union
        "stats": {"lang": {"min": "de", "max": "ru", "null_count": 3}},
    },
]


def test_avro_roundtrip_both_codecs(tmp_path):
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"m_{codec}.avro")
        write_manifest_avro(p, SAMPLE, codec=codec)
        got = read_manifest_avro(p)
        assert got == SAMPLE


def test_avro_files_readable_by_java_avro(spark, tmp_path):
    """Spec compliance: the official Java Avro library (avro-1.12.1.jar on
    Spark's classpath) must parse our container files byte-for-byte."""
    jvm = spark._jvm
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"jm_{codec}.avro")
        write_manifest_avro(p, SAMPLE, codec=codec)
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), reader)
        got = []
        while dfr.hasNext():
            rec = dfr.next()
            added = rec.get("added_by")
            frid = rec.get("first_row_id")
            got.append({
                "path": str(rec.get("path")),
                "row_count": rec.get("row_count"),
                "size_bytes": rec.get("size_bytes"),
                "added_by": None if added is None else int(added),
                "first_row_id": None if frid is None else int(frid),
                "stats": json.loads(str(rec.get("stats_json"))),
            })
        dfr.close()
        assert got == SAMPLE, f"Java Avro disagrees for codec={codec}"


def test_new_tables_write_avro_manifests(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"), generate_pages(spark, 100, seed=71, partitions=2)
    )
    rels = tbl.manifests_of(tbl.current_snapshot())
    assert all(r.endswith(".avro") for r in rels)
    assert tbl.scan().count() == 100
    # stats survive the avro round trip → pruning still works
    assert all(f.stats.get("url") for f in tbl.live_files())


def test_jsonl_property_keeps_legacy_format(spark, tmp_path):
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 80, seed=72, partitions=2),
        properties={"manifest.codec": "jsonl"},
    )
    tbl.append(generate_pages(spark, 20, seed=73, partitions=1))
    rels = tbl.manifests_of(tbl.current_snapshot())
    assert all(r.endswith(".jsonl") for r in rels)
    assert tbl.scan().count() == 100


def test_rewrite_manifests_migrates_jsonl_to_avro(spark, tmp_path):
    """The north_star's 'Avro manifest rewrite': a legacy-format table is
    migrated in one atomic commit — same data files, avro manifests, and
    the property flips so future commits stay avro."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"),
        generate_pages(spark, 90, seed=74, partitions=3),
        properties={"manifest.codec": "jsonl"},
    )
    tbl.append(generate_pages(spark, 30, seed=75, partitions=1))
    files_before = sorted(f.path for f in tbl.live_files())

    snap = rewrite_manifests(tbl, codec="avro")
    rels = tbl.manifests_of(snap)
    assert all(r.endswith(".avro") for r in rels)
    assert sorted(f.path for f in tbl.live_files()) == files_before
    assert tbl.scan().count() == 120
    assert tbl.properties()["manifest.codec"] == "avro"
    # future appends follow the migrated format
    tbl.append(generate_pages(spark, 10, seed=76, partitions=1))
    assert all(
        r.endswith(".avro") for r in tbl.manifests_of(tbl.current_snapshot())
    )


def test_avro_manifest_size_beats_jsonl(spark, tmp_path):
    """The reason Avro is the default: same entries, materially smaller."""
    tbl = IcehouseTable.create(
        spark, str(tmp_path / "t"), generate_pages(spark, 200, seed=77, partitions=4)
    )
    files = tbl.live_files()
    avro_rel = tbl._write_manifest(files, fmt="avro")
    jsonl_rel = tbl._write_manifest(files, fmt="jsonl")
    a = os.path.getsize(os.path.join(tbl.path, avro_rel))
    j = os.path.getsize(os.path.join(tbl.path, jsonl_rel))
    assert a < j * 0.6, f"avro {a}B should be well under jsonl {j}B"
