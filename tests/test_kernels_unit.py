"""Spark-free unit tests: curve kernels, stats bounds, pruning predicates,
text extraction, fake decoder — fast coverage of the pure-Python layer."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_lakehouse_spark.datagen.pages import extract_text_bytes
from ecommerce_lakehouse_spark.functions.multimodal import _fake_features
from ecommerce_lakehouse_spark.functions.zorder_kernel import (
    hilbert_index,
    hilbert_index_slow,
    morton_interleave,
)
from ecommerce_lakehouse_spark.table.format import DataFile
from ecommerce_lakehouse_spark.table.predicates import Predicate, prune_files
from ecommerce_lakehouse_spark.table.stats import _norm, _truncate_upper


# ------------------------------------------------------------------ curves

@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=50),
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_morton_roundtrip_order_preserving(xs, ys):
    n = min(len(xs), len(ys))
    x = np.array(xs[:n], dtype=np.int64)
    y = np.array(ys[:n], dtype=np.int64)
    z = morton_interleave(x, y)
    assert (z < np.uint64(1) << np.uint64(62)).all(), "codes fit signed int64"
    # deinterleave recovers inputs (bijectivity on the 62-bit domain)
    def deinter(v, shift):
        v = (v >> np.uint64(shift)) & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v.astype(np.int64)
    assert (deinter(z, 0) == x).all()
    assert (deinter(z, 1) == y).all()


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=100, deadline=None)
def test_hilbert_property_matches_reference(x, y):
    fast = hilbert_index(np.array([x], dtype=np.int64), np.array([y], dtype=np.int64), 16)
    assert int(fast[0]) == hilbert_index_slow(x, y, 16)


def test_hilbert_locality_adjacent_cells():
    """Hilbert guarantees adjacent curve positions are adjacent cells."""
    bits = 5
    side = 1 << bits
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    d = hilbert_index(xs.ravel().astype(np.int64), ys.ravel().astype(np.int64), bits)
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    step = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (step == 1).all(), "consecutive curve points must be grid neighbors"


# ----------------------------------------------------------- stats bounds

def test_truncate_upper_is_still_upper_bound():
    s = "a" * 100 + "zzz"
    t = _truncate_upper(s)
    assert len(t) <= 64 and t > s[:64] and t >= s[:65]


def test_norm_timestamp_to_micros():
    import datetime

    assert _norm(datetime.datetime(1970, 1, 1, 0, 0, 1), upper=False) == 1_000_000


# ------------------------------------------------------------- predicates

def _file(stats, rows=100):
    return DataFile("data/x.parquet", rows, 1000, stats)


def test_prune_conservative_on_missing_stats():
    f = _file({})
    assert prune_files([f], [Predicate("a", ">", 5)]) == [f]


def test_prune_exact_ranges():
    f = _file({"a": {"min": 10, "max": 20, "null_count": 0}})
    keep = lambda p: prune_files([f], [p]) == [f]
    assert keep(Predicate("a", ">", 15))
    assert not keep(Predicate("a", ">", 20))
    assert keep(Predicate("a", ">=", 20))
    assert not keep(Predicate("a", "<", 10))
    assert keep(Predicate("a", "<=", 10))
    assert keep(Predicate("a", "=", 10)) and not keep(Predicate("a", "=", 9))
    assert keep(Predicate("a", "in", (1, 2, 11)))
    assert not keep(Predicate("a", "in", (1, 2, 9)))


def test_prune_null_semantics():
    all_null = _file({"a": {"min": None, "max": None, "null_count": 100}})
    assert prune_files([all_null], [Predicate("a", ">", 1)]) == []
    assert prune_files([all_null], [Predicate("a", "is_null")]) == [all_null]
    assert prune_files([all_null], [Predicate("a", "not_null")]) == []
    no_nulls = _file({"a": {"min": 1, "max": 2, "null_count": 0}})
    assert prune_files([no_nulls], [Predicate("a", "is_null")]) == []


def test_prune_incomparable_types_kept():
    f = _file({"a": {"min": "x", "max": "y", "null_count": 0}})
    assert prune_files([f], [Predicate("a", ">", 5)]) == [f]


# ----------------------------------------------------------- text / bytes

def test_extract_text_strips_tags_and_normalizes_space():
    html = b"<html><head><title>T</title></head><body><p>a  b</p><br/>c</body></html>"
    assert extract_text_bytes(html) == "T a b c"


def test_extract_text_handles_bad_utf8():
    assert "replacement" not in extract_text_bytes(b"<p>\xff\xfe ok</p>")
    assert "ok" in extract_text_bytes(b"<p>\xff\xfe ok</p>")


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=50, deadline=None)
def test_fake_features_deterministic_normalized(payload):
    a = _fake_features(payload, 16)
    b = _fake_features(payload, 16)
    assert a.shape == (16,) and (a == b).all()
    if len(payload):
        assert abs(float(a.sum()) - 1.0) < 1e-3
