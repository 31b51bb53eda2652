"""Vectorized space-filling-curve kernels: Morton (Z-order) and Hilbert.

The clustering axes per BASELINE.json: 31-bit url-hash × 31-bit warc_ts.
The url hash is computed JVM-side with the built-in ``xxhash64`` (stays in
whole-stage codegen); only the bit-interleave runs in Python — as a
``pandas_udf`` over numpy uint64 arrays (Arrow batches), never per-row
(SURVEY §2.10: the engine bans row-at-a-time Python by construction).

31 bits per dimension → 62-bit codes that fit a positive int64, so Spark's
``repartitionByRange`` orders them correctly without unsigned tricks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

BITS = 31
MASK31 = np.uint64((1 << BITS) - 1)


# ---------------------------------------------------------------------------
# Morton (bit interleave) — magic-number bit spreading, fully vectorized
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to even bit positions."""
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two 31-bit coordinate arrays into 62-bit Morton codes."""
    x = x.astype(np.uint64) & MASK31
    y = y.astype(np.uint64) & MASK31
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


# ---------------------------------------------------------------------------
# k-dimensional Morton — generic bit interleave (63//k bits per dimension so
# codes stay positive int64); fully vectorized: bits*k shift/or passes.
# ---------------------------------------------------------------------------

def bits_for_dims(k: int) -> int:
    """Bits per dimension so the interleaved code fits a positive int64."""
    if k < 2:
        raise ValueError("need >= 2 dimensions")
    return 63 // k


def morton_interleave_k(coords: list[np.ndarray], bits: int | None = None) -> np.ndarray:
    """Interleave k coordinate arrays into Morton codes (dim 0 = lowest bit).

    For k=2 with bits=31 this agrees bit-for-bit with morton_interleave."""
    k = len(coords)
    if bits is None:
        bits = bits_for_dims(k)
    mask = np.uint64((1 << bits) - 1)
    cs = [c.astype(np.uint64) & mask for c in coords]
    out = np.zeros_like(cs[0])
    one = np.uint64(1)
    for b in range(bits):
        for d, c in enumerate(cs):
            out |= ((c >> np.uint64(b)) & one) << np.uint64(b * k + d)
    return out


# ---------------------------------------------------------------------------
# Hilbert — iterative xy→d, vectorized rotations (31 rounds of numpy ops)
# ---------------------------------------------------------------------------

def hilbert_index(x: np.ndarray, y: np.ndarray, bits: int = BITS) -> np.ndarray:
    """Map 2-D points to their 1-D Hilbert-curve distance (order ``bits``)."""
    x = x.astype(np.uint64) & np.uint64((1 << bits) - 1)
    y = y.astype(np.uint64) & np.uint64((1 << bits) - 1)
    x = x.copy()
    y = y.copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant: if ry==0 { if rx==1 { x,y = s-1-x, s-1-y }; swap }
        ry0 = ry == 0
        flip = ry0 & (rx == 1)
        sm1 = s - one
        np.subtract(sm1, x, out=x, where=flip)
        np.subtract(sm1, y, out=y, where=flip)
        xt = np.where(ry0, y, x)
        y = np.where(ry0, x, y)
        x = xt
        s >>= one
    return d


def hilbert_index_k(coords: list[np.ndarray], bits: int | None = None) -> np.ndarray:
    """k-dimensional Hilbert index via Skilling's transpose algorithm
    (J. Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
    2004) — vectorized: the per-bit invert/exchange passes become numpy
    masked ops, then the transposed coordinates are bit-interleaved
    MSB-first into the index. ~bits*k vector passes, no Python per row."""
    n = len(coords)
    if bits is None:
        bits = bits_for_dims(n)
    mask = np.uint64((1 << bits) - 1)
    X = [c.astype(np.uint64) & mask for c in coords]
    one = np.uint64(1)

    # inverse undo excess work
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        P = Q - one
        for i in range(n):
            nz = (X[i] & Q) != 0
            X[0] = np.where(nz, X[0] ^ P, X[0])            # invert
            t = np.where(nz, np.uint64(0), (X[0] ^ X[i]) & P)  # exchange
            X[0] ^= t
            X[i] ^= t
        Q >>= one
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - one), t)
        Q >>= one
    for i in range(n):
        X[i] ^= t

    # interleave the transposed coordinates MSB-first: X[0] holds the most
    # significant bit of each bit-plane
    d = np.zeros_like(X[0])
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << one) | ((X[i] >> np.uint64(j)) & one)
    return d


def _skilling_axes_to_transpose(x: list[int], bits: int) -> list[int]:
    """Scalar Skilling AxestoTranspose (reference for kernel tests)."""
    X = list(x)
    n = len(X)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = 1 << (bits - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    return [v ^ t for v in X]


def hilbert_index_k_slow(coords: list[int], bits: int) -> int:
    """Scalar k-dim Hilbert index (reference for kernel tests)."""
    X = _skilling_axes_to_transpose(coords, bits)
    d = 0
    for j in range(bits - 1, -1, -1):
        for i in range(len(X)):
            d = (d << 1) | ((X[i] >> j) & 1)
    return d


def hilbert_transpose_to_axes(h: int, n: int, bits: int) -> list[int]:
    """Scalar inverse (index -> coordinates) — used by tests to prove the
    curve property: consecutive indexes differ by exactly one unit step."""
    # de-interleave MSB-first into the transposed form
    X = [0] * n
    for b in range(n * bits):
        X[b % n] = (X[b % n] << 1) | ((h >> (n * bits - 1 - b)) & 1)
    # Skilling TransposetoAxes
    N = 2 << (bits - 1)
    t = X[n - 1] >> 1
    for i in range(n - 1, 0, -1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    Q = 2
    while Q != N:
        P = Q - 1
        for i in range(n - 1, -1, -1):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q <<= 1
    return X


def hilbert_index_slow(x: int, y: int, bits: int = BITS) -> int:
    """Scalar reference implementation (Wikipedia xy2d) for kernel tests."""
    rx = ry = 0
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


# ---------------------------------------------------------------------------
# Spark-facing pandas UDFs
# ---------------------------------------------------------------------------

@pandas_udf(LongType())
def morton_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    codes = morton_interleave(
        x.fillna(0).to_numpy(np.int64), y.fillna(0).to_numpy(np.int64)
    )
    return pd.Series(codes.astype(np.int64))


@pandas_udf(LongType())
def hilbert_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    codes = hilbert_index(
        x.fillna(0).to_numpy(np.int64), y.fillna(0).to_numpy(np.int64)
    )
    return pd.Series(codes.astype(np.int64))


# no per-arg type hints on the varargs UDFs: this module uses
# `from __future__ import annotations` and pandas_udf's hint inference
# can't resolve stringified hints for *args — the explicit returnType
# makes them scalar UDFs regardless
@pandas_udf(LongType())
def morton_k_udf(*cols):
    arrs = [c.fillna(0).to_numpy(np.int64) for c in cols]
    codes = morton_interleave_k(arrs, bits_for_dims(len(arrs)))
    return pd.Series(codes.astype(np.int64))


@pandas_udf(LongType())
def hilbert_k_udf(*cols):
    arrs = [c.fillna(0).to_numpy(np.int64) for c in cols]
    codes = hilbert_index_k(arrs, bits_for_dims(len(arrs)))
    return pd.Series(codes.astype(np.int64))


# ---------------------------------------------------------------------------
# JVM-expression Morton (r6): the 2-D interleave is 12 bitwise ops per
# coordinate, so it runs inside whole-stage codegen with NO Python boundary
# at all (guide §4.1: prefer built-ins when they exist). This matters twice
# in a clustering rewrite: repartitionByRange SAMPLES its input to pick
# range bounds, executing the code expression a second time — with the
# pandas kernel that was two Arrow round-trips per rewrite, with this it is
# zero. Bit-identical to morton_udf (tests/test_kernels_unit.py parity
# test); the pandas kernels remain for Hilbert and k>2 interleaves, whose
# expression trees would blow up codegen.
# ---------------------------------------------------------------------------

def _part1by1_col(v: Column) -> Column:
    """JVM twin of :func:`_part1by1` — spread low 32 bits to even positions.

    All masks are < 2^63 and inputs are pre-masked to 31 bits, so signed
    long arithmetic agrees with the numpy uint64 kernel bit-for-bit."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def morton_col(x: Column, y: Column) -> Column:
    """Pure-JVM 2-D Morton interleave, bit-identical to :func:`morton_udf`
    (including its null→0 fill and 31-bit masking)."""
    mask = F.lit((1 << BITS) - 1)
    xm = _part1by1_col(F.coalesce(x.cast("long"), F.lit(0)).bitwiseAND(mask))
    ym = _part1by1_col(F.coalesce(y.cast("long"), F.lit(0)).bitwiseAND(mask))
    return xm.bitwiseOR(F.shiftleft(ym, 1))


def coordn(col: Column, bits: int, lo: Column | None = None,
           hi: Column | None = None) -> Column:
    """Normalize a numeric column into [0, 2^bits) JVM-side.

    With lo/hi bounds: min-max scale (for timestamps etc.); without: mask to
    the low ``bits`` bits (for already-uniform hashes).
    """
    if lo is None:
        return F.pmod(col.cast("long"), F.lit(1 << bits))
    span = (hi.cast("double") - lo.cast("double"))
    frac = (col.cast("double") - lo.cast("double")) / F.when(span > 0, span).otherwise(F.lit(1.0))
    scaled = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)) * F.lit(float((1 << bits) - 1))
    return scaled.cast("long")


def coord31(col: Column, lo: Column | None = None, hi: Column | None = None) -> Column:
    """31-bit (2-D default) wrapper over :func:`coordn`."""
    return coordn(col, BITS, lo, hi)


def url_hash31(url: Column) -> Column:
    """31-bit url hash via built-in xxhash64 (JVM, codegen-friendly)."""
    return F.pmod(F.xxhash64(url), F.lit(1 << BITS))


def url_prefix31(url: Column, skip_common_prefix: int = 0) -> Column:
    """31-bit LEXICOGRAPHIC coordinate: 4 utf8 bytes of the url (after the
    table's common prefix — 'https://…' carries no information) as a
    big-endian integer (>>1 to fit 31 bits). Unlike ``url_hash31``, value
    ranges map to code ranges, so url-range predicates prune post-cluster
    (Delta-style value Z-order); the hash coordinate instead optimizes
    key-equality locality (MERGE discovery). Both stay JVM-side.
    """
    first4 = F.rpad(
        F.substring(url.cast("binary"), skip_common_prefix + 1, 4), 4, bytes([0])
    )
    as_int = F.conv(F.hex(first4), 16, 10).cast("long")
    return F.shiftright(as_int, 1)
