"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, with decode/feature-extraction as Arrow-batched
``mapInPandas`` kernels.

The sandbox has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises NotImplementedError; ``fake_decode=True`` swaps in
a deterministic byte-histogram "decoder") — but everything Spark-side is
real and tested: schemas, batch shapes, partition sizing, UDF signatures.
Swapping the stub for PIL/torchaudio on a real cluster changes one function.

Scale notes: binary payloads dominate partition size, so the helpers size
partitions by BYTES (maxRecordsPerBatch / repartition on byte budget), and
metadata extraction (magic-number sniffing, sizes) stays JVM-side so plain
metadata queries never deserialize payloads into Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number sniffing JVM-side: hex prefix → media type
_MAGIC = [
    ("ffd8ff", "image/jpeg"),
    ("89504e47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "audio/mpeg"),
    ("3c68746d6c", "text/html"),
    ("3c21646f63", "text/html"),
]


def sniff_media_type(col: Column) -> Column:
    """Magic-number media-type detection on the binary prefix (pure JVM)."""
    prefix = F.lower(F.hex(F.expr(f"substring({col._jc.toString()}, 1, 8)")))
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic.lower()), F.lit(mtype)).otherwise(expr)
    return expr


def binary_metadata(df: DataFrame, bin_col: str) -> DataFrame:
    """Typed metadata columns without touching Python: size, type, emptiness."""
    c = F.col(bin_col)
    return df.withColumns(
        {
            "media_size_bytes": F.length(c).cast("long"),
            "media_type": sniff_media_type(c),
            "media_is_empty": c.isNull() | (F.length(c) == 0),
        }
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder seam — not available in this sandbox."""
    raise NotImplementedError(
        "image decoding requires a codec library (PIL/opencv); "
        "this environment ships none — use fake_decode for plumbing tests"
    )


def _fake_features(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in 'decoder': normalized byte histogram folded to
    n_features — stable across runs/partitions, good enough to exercise the
    full Spark data path (Arrow transfer, batch shapes, schema)."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_features, dtype=np.float32)
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    folded = hist.reshape(n_features, 256 // n_features).sum(axis=1)
    total = folded.sum()
    return (folded / total).astype(np.float32) if total else folded.astype(np.float32)


def extract_features(
    df: DataFrame,
    bin_col: str,
    id_cols: list[str],
    n_features: int = 16,
    fake_decode: bool = True,
    batch_bytes: int = 64 * 1024 * 1024,
    total_bytes: int | None = None,
) -> DataFrame:
    """binary → feature vector via mapInPandas (Arrow batches).

    Partitions are resized to ≈batch_bytes of payload each, so executor
    memory is bounded by bytes, not row counts (html/image sizes are skewed).
    Pass ``total_bytes`` from table metadata (manifest byte stats — e.g.
    ``sum(f.size_bytes for f in table.live_files())``) to skip the sizing
    scan; without it, one agg pass measures the payload column.
    """
    if total_bytes is None:
        total_bytes = df.agg(F.sum(F.length(bin_col))).first()[0] or 0
    n_parts = max(1, int(total_bytes // batch_bytes) + 1)
    out_schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + f", features array<float>, media_size_bytes long"
    )

    decoder = _fake_features if fake_decode else (
        lambda p, n: decode_image(p)  # pragma: no cover — real-cluster seam
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, n_features) for p in pdf[bin_col]]
            out = {c: pdf[c].astype(str) for c in id_cols}
            out["features"] = [f.tolist() for f in feats]
            out["media_size_bytes"] = [
                len(p) if p is not None else 0 for p in pdf[bin_col]
            ]
            yield pd.DataFrame(out)

    return (
        df.select(*id_cols, bin_col)
        .repartition(n_parts)
        .mapInPandas(kernel, out_schema)
    )


def sample_frames(
    df: DataFrame, bin_col: str, id_cols: list[str], every_n_bytes: int = 4096
) -> DataFrame:
    """'Frame sampling' plumbing: slice the payload at fixed strides JVM-side
    (posexplode over computed offsets) — the shape of video-frame extraction
    without a codec: one output row per (id, frame_no, frame_bytes)."""
    c = F.col(bin_col)
    offsets = F.sequence(
        F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(every_n_bytes)
    )
    ex = df.select(
        *id_cols, c.alias("__bin"), F.posexplode(offsets).alias("frame_no", "off")
    )
    return ex.select(
        *id_cols,
        "frame_no",
        F.expr(f"substring(__bin, off, {every_n_bytes})").alias("frame_bytes"),
    )
