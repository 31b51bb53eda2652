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


# ----------------------------------------------------- image header decode

def test_parse_png_header_roundtrip():
    from ecommerce_lakehouse_spark.functions.multimodal import (
        parse_image_header, synth_png,
    )

    for w, h in ((1, 1), (16, 8), (640, 480), (47, 313)):
        meta = parse_image_header(synth_png(w, h, seed=w))
        assert meta == {
            "format": "png", "width": w, "height": h,
            "channels": 3, "bit_depth": 8,
        }


def test_synth_png_is_fully_valid():
    """The synthetic PNG must be a real PNG: correct chunk CRCs and an IDAT
    that inflates to exactly height*(1+width*3) filter+pixel bytes."""
    import struct
    import zlib

    from ecommerce_lakehouse_spark.functions.multimodal import synth_png

    b = synth_png(21, 9, seed=4)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    off, chunks = 8, {}
    while off < len(b):
        ln = struct.unpack(">I", b[off:off + 4])[0]
        ctype = b[off + 4:off + 8]
        data = b[off + 8:off + 8 + ln]
        crc = struct.unpack(">I", b[off + 8 + ln:off + 12 + ln])[0]
        assert crc == zlib.crc32(ctype + data), f"bad CRC on {ctype}"
        chunks[ctype] = data
        off += 12 + ln
    assert set(chunks) == {b"IHDR", b"IDAT", b"IEND"}
    raw = zlib.decompress(chunks[b"IDAT"])
    assert len(raw) == 9 * (1 + 21 * 3)


def test_parse_jpeg_header_walks_marker_stream():
    from ecommerce_lakehouse_spark.functions.multimodal import (
        parse_image_header, synth_jpeg,
    )

    meta = parse_image_header(synth_jpeg(320, 200))
    assert meta == {
        "format": "jpeg", "width": 320, "height": 200,
        "channels": 3, "bit_depth": 8,
    }


def test_parse_gif_header():
    from ecommerce_lakehouse_spark.functions.multimodal import (
        parse_image_header, synth_gif,
    )

    meta = parse_image_header(synth_gif(99, 77))
    assert meta == {
        "format": "gif", "width": 99, "height": 77,
        "channels": 3, "bit_depth": 8,
    }


def test_parse_image_header_rejects_non_images():
    from ecommerce_lakehouse_spark.functions.multimodal import parse_image_header

    assert parse_image_header(None) is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"<html><body>hi</body></html>") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\x00 corrupted") is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF


def test_header_features_carry_real_dimensions():
    from ecommerce_lakehouse_spark.functions.multimodal import (
        _header_features, synth_png,
    )

    f = _header_features(synth_png(33, 12), 16)
    assert list(f[:4]) == [33.0, 12.0, 3.0, 8.0]
    assert len(f) == 16


def test_sniff_media_type_on_synth_payloads(spark):
    from ecommerce_lakehouse_spark.functions.multimodal import (
        binary_metadata, synth_gif, synth_jpeg, synth_png,
    )

    df = spark.createDataFrame(
        [("p", bytearray(synth_png(4, 4))), ("j", bytearray(synth_jpeg(4, 4))),
         ("g", bytearray(synth_gif(4, 4)))],
        "k string, payload binary",
    )
    got = {r.k: r.media_type for r in binary_metadata(df, "payload").collect()}
    assert got == {"p": "image/png", "j": "image/jpeg", "g": "image/gif"}


# ------------------------------------------------- k-dimensional curves

def test_morton_k2_matches_2d_kernel():
    import numpy as np

    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        morton_interleave, morton_interleave_k,
    )

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 31, 1000).astype(np.int64)
    y = rng.integers(0, 1 << 31, 1000).astype(np.int64)
    assert (morton_interleave(x, y) == morton_interleave_k([x, y], 31)).all()


def test_morton_k3_matches_scalar_reference():
    import numpy as np

    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        morton_interleave_k,
    )

    def slow(a, b, c, bits):
        out = 0
        for i in range(bits):
            out |= (
                ((a >> i) & 1) << (3 * i)
                | ((b >> i) & 1) << (3 * i + 1)
                | ((c >> i) & 1) << (3 * i + 2)
            )
        return out

    rng = np.random.default_rng(11)
    a, b, c = (rng.integers(0, 1 << 21, 400) for _ in range(3))
    got = morton_interleave_k([a, b, c], 21)
    exp = np.array(
        [slow(int(i), int(j), int(k), 21) for i, j, k in zip(a, b, c)],
        dtype=np.uint64,
    )
    assert (got == exp).all()


def test_hilbert_k_vectorized_matches_scalar():
    import numpy as np

    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        hilbert_index_k, hilbert_index_k_slow,
    )

    rng = np.random.default_rng(13)
    for n, bits in ((2, 8), (3, 5), (4, 4)):
        pts = [rng.integers(0, 1 << bits, 300) for _ in range(n)]
        got = hilbert_index_k(pts, bits)
        exp = np.array(
            [hilbert_index_k_slow([int(p[i]) for p in pts], bits)
             for i in range(300)],
            dtype=np.uint64,
        )
        assert (got == exp).all(), (n, bits)


def test_hilbert_3d_is_a_true_hilbert_curve():
    """Defining properties on the full 8x8x8 grid: the index is a bijection
    and consecutive indexes are exactly one unit step apart."""
    from ecommerce_lakehouse_spark.functions.zorder_kernel import (
        hilbert_index_k_slow, hilbert_transpose_to_axes,
    )

    n, bits = 3, 3
    seen, prev = set(), None
    for h in range(1 << (n * bits)):
        ax = tuple(hilbert_transpose_to_axes(h, n, bits))
        assert ax not in seen
        seen.add(ax)
        if prev is not None:
            assert sum(abs(a - b) for a, b in zip(ax, prev)) == 1
        prev = ax
        assert hilbert_index_k_slow(list(ax), bits) == h


@given(st.lists(st.integers(min_value=0, max_value=2047), max_size=300))
@settings(max_examples=200, deadline=None)
def test_sketch_bitmap_roundtrip_contains_all_members(positions):
    """Every inserted position tests positive; a bitmap never false-
    negatives (the property merge routing's correctness rests on)."""
    from ecommerce_lakehouse_spark.table.format import _sketch_b64, _sketch_hits

    b64 = _sketch_b64(positions)
    for p in set(positions):
        assert _sketch_hits(b64, [p])
    if positions:
        assert _sketch_hits(b64, positions)


@given(
    st.sets(st.integers(min_value=0, max_value=2047), max_size=100),
    st.sets(st.integers(min_value=0, max_value=2047), max_size=100),
)
@settings(max_examples=200, deadline=None)
def test_sketch_disjoint_sets_never_hit(members, probes):
    from ecommerce_lakehouse_spark.table.format import _sketch_b64, _sketch_hits

    probes = probes - members
    b64 = _sketch_b64(members)
    assert not _sketch_hits(b64, probes)
    assert not _sketch_hits(b64, [])
