"""Row lineage (Iceberg-v3-style stable ``_row_id``).

Every commit assigns each added data file a ``first_row_id`` range from the
table-level ``next-row-id`` counter (pure metadata); a lineage read computes
``coalesce(<materialized _row_id>, first_row_id + pos)``. With the
``row-lineage`` table property set, rewrites (MERGE / compaction / Z-order)
MATERIALIZE carried ids as a physical parquet column — a document's id
survives maintenance, the provenance invariant an incremental 10^12-doc
training-data consumer keys on.

Reference parity note: the reference repo has no row identity at all (its
SCD notebooks key on business keys only) — this is engine-native scope,
modeled on the Iceberg v3 spec's row-lineage rules (public spec).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_spark.datagen import generate_pages
from ecommerce_lakehouse_spark.maintenance.compact import compact
from ecommerce_lakehouse_spark.maintenance.zorder import zorder_by
from ecommerce_lakehouse_spark.operators.merge import merge_into
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate, delete_where
from ecommerce_lakehouse_spark.table.format import NEXT_ROW_ID_KEY, ROW_ID


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 200, seed=71, partitions=4)
    return IcehouseTable.create(
        spark, str(tmp_path / "t"), df, properties={"row-lineage": "true"}
    )


def _ids(table, **scan_kw):
    rows = (
        table.scan(row_lineage=True, **scan_kw)
        .select("url", ROW_ID)
        .collect()
    )
    return {r.url: r[ROW_ID] for r in rows}


def test_virtual_ids_unique_and_dense_across_appends(spark, table):
    # NOTE: urls collide across same-id batches — ids must stay unique anyway
    table.append(generate_pages(spark, 100, seed=72, partitions=2))
    vals = sorted(
        r[ROW_ID]
        for r in table.scan(row_lineage=True).select(ROW_ID).collect()
    )
    assert vals == list(range(300)), (
        "virtual ids must be dense 0..N-1 across append commits"
    )
    # the counter is table metadata, not prose
    md = table.load_metadata()
    assert md[NEXT_ROW_ID_KEY] == 300


def test_merge_preserves_surviving_ids(spark, table):
    before = _ids(table)
    upd = generate_pages(spark, 40, seed=71, partitions=2, revision=1)
    new = generate_pages(spark, 10, seed=99, partitions=1).withColumn(
        "url", F.concat(F.lit("https://fresh.example/"), F.col("url"))
    )
    merge_into(table, upd.unionByName(new), "url")
    after = _ids(table)
    assert len(after) == 210
    survivors = set(before) & set(after)
    assert survivors == set(before)
    assert all(before[u] == after[u] for u in survivors), (
        "MERGE must keep the TARGET's _row_id on matched rows"
    )
    fresh = {v for u, v in after.items() if u not in before}
    assert len(fresh) == 10 and min(fresh) >= 200, (
        "inserted rows must draw NEW ids from the counter"
    )
    assert fresh.isdisjoint(set(before.values()))


def test_compact_then_zorder_preserve_ids(spark, table):
    # prefix the second batch's urls: generate_pages urls are deterministic
    # in row id, so cross-batch collisions would make the url-keyed check lie
    table.append(
        generate_pages(spark, 100, seed=73, partitions=3).withColumn(
            "url", F.concat(F.lit("https://b2.example/"), F.col("url"))
        )
    )
    merge_into(
        table, generate_pages(spark, 30, seed=71, partitions=1, revision=2), "url"
    )
    before = _ids(table)
    assert compact(table) is not None
    assert _ids(table) == before, "compaction changed row ids"
    assert zorder_by(table, url_col="url", ts_col="warc_ts") is not None
    assert _ids(table) == before, "Z-order clustering changed row ids"


def test_delete_keeps_survivor_ids(spark, table):
    before = _ids(table)
    victims = sorted(before)[:7]
    delete_where(table, [Predicate("url", "in", tuple(victims))])
    after = _ids(table)
    assert set(after) == set(before) - set(victims)
    assert all(before[u] == after[u] for u in after)
    # compaction materializes the DVs; ids still survive
    compact(table)
    assert _ids(table) == after


def test_assign_row_ids_backfills_metadata_only(spark, tmp_path):
    df = generate_pages(spark, 150, seed=74, partitions=3)
    t = IcehouseTable.create(spark, str(tmp_path / "t"), df)  # lineage OFF
    ids = _ids(t)
    assert all(v is None for v in ids.values()), (
        "pre-feature files must read NULL _row_id until assign_row_ids"
    )
    t.set_properties({"row-lineage": "true"})
    files_before = {f.path for f in t.live_files()}
    snap = t.assign_row_ids()
    assert snap is not None and snap.operation == "assign-row-ids"
    # METADATA-ONLY: the same physical files, now carrying first_row_id
    files_after = {f.path: f for f in t.live_files()}
    assert set(files_after) == files_before
    assert all(f.first_row_id is not None for f in files_after.values())
    ids = _ids(t)
    assert sorted(ids.values()) == list(range(150))
    # idempotent: nothing left to assign
    assert t.assign_row_ids() is None


def test_assign_row_ids_preserves_added_by_for_eq_deletes(spark, tmp_path):
    from ecommerce_lakehouse_spark.table.deletes import delete_by_key

    df = generate_pages(spark, 100, seed=75, partitions=2)
    t = IcehouseTable.create(spark, str(tmp_path / "t"), df)
    victims = sorted(r.url for r in t.scan().select("url").collect())[:5]
    delete_by_key(t, "url", victims)
    assert t.scan().count() == 95
    t.set_properties({"row-lineage": "true"})
    t.assign_row_ids()
    # the re-added files must NOT escape the equality delete recorded
    # against their original commit sequence
    assert t.scan().count() == 95
    assert len(_ids(t)) == 95


def test_reserved_column_name_refused(spark, tmp_path):
    df = generate_pages(spark, 10, seed=76, partitions=1).withColumn(
        ROW_ID, F.lit(1).cast("long")
    )
    with pytest.raises(ValueError, match="reserved"):
        IcehouseTable.create(spark, str(tmp_path / "t"), df)


def test_merge_source_carrying_row_id_uses_target_identity(spark, table):
    before = _ids(table)
    # a lineage scan used as a merge source (self-merge shape): its _row_id
    # column must be dropped — matched rows keep the TARGET id
    src = (
        table.scan(row_lineage=True)
        .limit(20)
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
        .withColumn(ROW_ID, F.col(ROW_ID) + 10_000)  # poisoned ids
    )
    merge_into(table, src, "url")
    after = _ids(table)
    assert after == before, "source _row_id must never override target ids"


def test_scan_column_projection_appends_row_id(spark, table):
    df = table.scan(columns=["url"], row_lineage=True)
    assert df.columns == ["url", ROW_ID]
    assert df.count() == 200


def test_v1_manifest_decodes_without_first_row_id(tmp_path):
    """Manifests written before the row-lineage field must still decode
    (first_row_id=None) — the reader dispatches on the FILE's schema."""
    import io as _io
    import json as _json
    import zlib

    from ecommerce_lakehouse_spark.table import avro_io as av

    v1_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "path", "type": "string"},
            {"name": "row_count", "type": "long"},
            {"name": "size_bytes", "type": "long"},
            {"name": "added_by", "type": ["null", "long"], "default": None},
            {"name": "stats_json", "type": "string"},
        ],
    }

    def enc_v1(rec):
        out = bytearray()
        out += av._encode_string(rec["path"])
        out += av._encode_long(rec["row_count"])
        out += av._encode_long(rec["size_bytes"])
        ab = rec.get("added_by")
        out += (av._encode_long(0) if ab is None
                else av._encode_long(1) + av._encode_long(ab))
        out += av._encode_string(_json.dumps(rec.get("stats", {})))
        return bytes(out)

    recs = [
        {"path": "data/a.parquet", "row_count": 5, "size_bytes": 100,
         "added_by": 3, "stats": {"url": {"min": "a", "max": "z"}}},
        {"path": "data/b.parquet", "row_count": 7, "size_bytes": 200,
         "added_by": None, "stats": {}},
    ]
    sync = b"\x00" * 16
    meta = {
        "avro.schema": _json.dumps(v1_schema).encode(),
        "avro.codec": b"deflate",
    }
    out = bytearray(av.MAGIC)
    out += av._encode_long(len(meta))
    for k, v in sorted(meta.items()):
        out += av._encode_string(k)
        out += av._encode_long(len(v)) + v
    out += av._encode_long(0)
    out += sync
    payload = b"".join(enc_v1(r) for r in recs)
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = c.compress(payload) + c.flush()
    out += av._encode_long(len(recs)) + av._encode_long(len(payload))
    out += payload + sync
    p = str(tmp_path / "v1.avro")
    with open(p, "wb") as f:
        f.write(bytes(out))

    got = av.read_manifest_avro(p)
    assert [r["path"] for r in got] == ["data/a.parquet", "data/b.parquet"]
    assert all(r["first_row_id"] is None for r in got)
    assert got[0]["added_by"] == 3 and got[0]["stats"]["url"]["max"] == "z"


def test_compression_codec_property_applies_to_all_writers(spark, tmp_path):
    import pyarrow.parquet as pq

    df = generate_pages(spark, 120, seed=77, partitions=2)
    t = IcehouseTable.create(
        spark, str(tmp_path / "t"), df,
        properties={"write.parquet.compression-codec": "zstd"},
    )

    def codecs(tbl):
        out = set()
        for f in tbl.live_files():
            md = pq.ParquetFile(os.path.join(tbl.path, f.path)).metadata
            out.add(md.row_group(0).column(0).compression)
        return out

    assert codecs(t) == {"ZSTD"}
    t.append(generate_pages(spark, 50, seed=78, partitions=1))
    merge_into(
        t, generate_pages(spark, 20, seed=77, partitions=1, revision=1), "url"
    )
    compact(t)
    assert codecs(t) == {"ZSTD"}, "every write path must honor the codec"


def test_row_id_never_in_stats_or_plain_scans(spark, table):
    merge_into(
        table, generate_pages(spark, 25, seed=71, partitions=1, revision=3), "url"
    )
    compact(table)
    # materialized _row_id column exists physically, but stats / schema /
    # plain scans never surface it
    for f in table.live_files():
        assert ROW_ID not in f.stats
    assert ROW_ID not in [fl.name for fl in table.schema().fields]
    assert ROW_ID not in table.scan().columns
