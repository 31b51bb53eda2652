"""SCD Type-2 history maintenance: AC-003 close/insert semantics,
multi-change batches, idempotent re-runs (NFR-007)."""

from __future__ import annotations

import datetime

import pytest

from ecommerce_lakehouse_spark.operators.scd import TS_MAX, scd2_merge
from ecommerce_lakehouse_spark.table import IcehouseTable, Predicate

NOW1 = datetime.datetime(2024, 6, 1, 12, 0, 0)
NOW2 = datetime.datetime(2024, 6, 2, 12, 0, 0)
SCHEMA = "url string, text string, lang string, crawl_ts timestamp_ntz"


def ts(s):
    return datetime.datetime.fromisoformat(s)


def batch(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], r[2], ts(r[3])) for r in rows], SCHEMA
    )


@pytest.fixture()
def dim_path(tmp_path):
    return str(tmp_path / "dim_pages")


def apply(spark, path, rows, now):
    return scd2_merge(
        spark, path, batch(spark, rows),
        business_keys=["url"], compare_cols=["text", "lang"], ts_col="crawl_ts",
        now=now,
    )


BASE = [
    ("u1", "hello v1", "en", "2024-01-01T00:00:00"),
    ("u2", "zwei v1", "de", "2024-01-01T01:00:00"),
    ("u3", "tres v1", "es", "2024-01-01T02:00:00"),
]


def rows_of(tbl):
    return {
        (r.url, r.text, str(r.effective_from), str(r.effective_to), r.is_current)
        for r in tbl.scan().collect()
    }


def test_initial_load_all_current(spark, dim_path):
    tbl = apply(spark, dim_path, BASE, NOW1)
    got = tbl.scan().collect()
    assert len(got) == 3
    assert all(r.is_current for r in got)
    assert all(r.effective_to == TS_MAX for r in got)
    assert all(r.loaded_at == NOW1 for r in got)


def test_ac003_update_closes_old_opens_new(spark, dim_path):
    """AC-003: after an attribute update, the old record gets effective_to
    populated (is_current=false) and a new current row exists."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(spark, dim_path, [("u1", "hello v2", "en", "2024-02-01T00:00:00")], NOW2)

    u1 = sorted(tbl.scan().filter("url = 'u1'").collect(), key=lambda r: r.effective_from)
    assert len(u1) == 2
    old, new = u1
    assert old.text == "hello v1" and not old.is_current
    assert str(old.effective_to) == "2024-02-01 00:00:00"
    assert old.updated_at == NOW2  # close stamped by the second run
    assert new.text == "hello v2" and new.is_current
    assert new.effective_to == TS_MAX
    # untouched keys keep exactly one current row
    assert tbl.scan().filter("url = 'u2' and is_current").count() == 1
    assert tbl.scan().filter("url = 'u2'").count() == 1


def test_multi_change_single_batch_chains_versions(spark, dim_path):
    """One key changing twice in a batch: versions chain via lead();
    only the earliest change closes the prior current row (W2/W3 + M2)."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(
        spark, dim_path,
        [
            ("u2", "zwei v2", "de", "2024-03-01T00:00:00"),
            ("u2", "zwei v3", "de", "2024-03-05T00:00:00"),
        ],
        NOW2,
    )
    u2 = sorted(tbl.scan().filter("url = 'u2'").collect(), key=lambda r: r.effective_from)
    assert [r.text for r in u2] == ["zwei v1", "zwei v2", "zwei v3"]
    assert [r.is_current for r in u2] == [False, False, True]
    assert str(u2[0].effective_to) == "2024-03-01 00:00:00"
    assert str(u2[1].effective_to) == "2024-03-05 00:00:00"
    assert u2[2].effective_to == TS_MAX
    # intervals tile: no gaps/overlaps
    assert u2[0].effective_to == u2[1].effective_from
    assert u2[1].effective_to == u2[2].effective_from


def test_rerun_is_noop(spark, dim_path):
    """NFR-007: re-applying an already-applied batch changes nothing."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    delta = [
        ("u2", "zwei v2", "de", "2024-03-01T00:00:00"),
        ("u2", "zwei v3", "de", "2024-03-05T00:00:00"),
        ("u9", "neun v1", "de", "2024-03-02T00:00:00"),
    ]
    apply(spark, dim_path, delta, NOW2)
    state = rows_of(tbl)
    apply(spark, dim_path, delta, datetime.datetime(2024, 6, 3))
    assert rows_of(tbl) == state


def test_new_key_inserted_current(spark, dim_path):
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(spark, dim_path, [("u7", "sieben", "de", "2024-04-01T00:00:00")], NOW2)
    u7 = tbl.scan().filter("url = 'u7'").collect()
    assert len(u7) == 1 and u7[0].is_current


def test_unchanged_row_ignored(spark, dim_path):
    """A recrawl with identical compare-columns must not create a version."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(spark, dim_path, [("u1", "hello v1", "en", "2024-02-15T00:00:00")], NOW2)
    assert tbl.scan().filter("url = 'u1'").count() == 1


def test_stale_change_ignored(spark, dim_path):
    """A change-ts older than the current version's effective_from is late,
    already-superseded data: ignored rather than corrupting the chain."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(spark, dim_path, [("u1", "hello v2", "en", "2024-02-01T00:00:00")], NOW2)
    state = rows_of(tbl)
    apply(spark, dim_path, [("u1", "stale text", "en", "2024-01-15T00:00:00")], NOW2)
    assert rows_of(tbl) == state


def test_surrogate_keys_deterministic_unique(spark, dim_path):
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(spark, dim_path, [("u1", "hello v2", "en", "2024-02-01T00:00:00")], NOW2)
    sks = [r.version_sk for r in tbl.scan().collect()]
    assert len(sks) == len(set(sks))
    assert all(len(s) == 32 for s in sks)


def test_point_in_time_scan(spark, dim_path):
    """Interval-join-ready: exactly one version valid at any probe ts."""
    tbl = apply(spark, dim_path, BASE, NOW1)
    apply(
        spark, dim_path,
        [
            ("u2", "zwei v2", "de", "2024-03-01T00:00:00"),
            ("u2", "zwei v3", "de", "2024-03-05T00:00:00"),
        ],
        NOW2,
    )
    probe = ts("2024-03-03T00:00:00")
    valid = tbl.scan(
        [Predicate("effective_from", "<=", probe), Predicate("effective_to", ">", probe)]
    ).filter("url = 'u2'").collect()
    assert len(valid) == 1 and valid[0].text == "zwei v2"
