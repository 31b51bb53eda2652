"""Minimal Avro Object Container File writer/reader for manifest entries.

BASELINE north_star names "Avro manifest rewrite and manifest-list
consolidation" explicitly: JSONL manifest rows are ~3-5x Avro size and parse
slower at millions-of-files scale. The sandbox ships no Python avro package
(and pip installs are off), so this is a from-scratch implementation of the
public Avro 1.x spec (https://avro.apache.org/docs/current/specification/)
covering exactly what manifests need: a flat record of
string/long/nullable-long fields, deflate or null codec, standard container
framing (Obj\\x01 magic, metadata map, sync-marker-delimited blocks).

Format compliance is proven in tests by reading these files back through the
REAL Java Avro library already on Spark's classpath (avro-1.12.1.jar via
py4j) — any Avro tool can consume Icehouse manifests.

Per-column stats are carried as a JSON string field: their shape is
column-set dependent (any column can gain min/max/null_count), and pinning
them into the record schema would force a manifest schema migration on every
table-schema change. Iceberg makes the same call with its binary
lower/upper-bound maps. The hot fields (path, sizes, lineage) are typed.
"""

from __future__ import annotations

import io
import json
import os
import uuid
import zlib

MAGIC = b"Obj\x01"

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "namespace": "icehouse",
    "fields": [
        {"name": "path", "type": "string"},
        {"name": "row_count", "type": "long"},
        {"name": "size_bytes", "type": "long"},
        {"name": "added_by", "type": ["null", "long"], "default": None},
        # row-lineage base id (v2 manifest field; older manifests lack it
        # and decode with None — the reader dispatches on the FILE's schema)
        {"name": "first_row_id", "type": ["null", "long"], "default": None},
        {"name": "stats_json", "type": "string"},
    ],
}
MANIFEST_SCHEMA_JSON = json.dumps(MANIFEST_SCHEMA)
_V1_FIELD_NAMES = ["path", "row_count", "size_bytes", "added_by", "stats_json"]
_V2_FIELD_NAMES = [f["name"] for f in MANIFEST_SCHEMA["fields"]]


# --------------------------------------------------------- primitive codec

def _encode_long(n: int) -> bytes:
    """zigzag + variable-length (7-bit groups, MSB = continuation).
    Python's arithmetic shift makes (n << 1) ^ (n >> 63) correct for
    negatives too: n >> 63 is -1, and x ^ -1 == ~x == -2n - 1."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _encode_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _encode_long(len(b)) + b


def _decode_string(buf: io.BytesIO) -> str:
    n = _decode_long(buf)
    return buf.read(n).decode("utf-8")


def _encode_entry(rec: dict) -> bytes:
    out = bytearray()
    out += _encode_string(rec["path"])
    out += _encode_long(rec["row_count"])
    out += _encode_long(rec["size_bytes"])
    for key in ("added_by", "first_row_id"):
        v = rec.get(key)
        if v is None:
            out += _encode_long(0)  # union branch 0: null
        else:
            out += _encode_long(1) + _encode_long(v)
    out += _encode_string(json.dumps(rec.get("stats", {}), separators=(",", ":")))
    return bytes(out)


def _decode_entry(buf: io.BytesIO, with_first_row_id: bool = True) -> dict:
    path = _decode_string(buf)
    row_count = _decode_long(buf)
    size_bytes = _decode_long(buf)
    branch = _decode_long(buf)
    added_by = _decode_long(buf) if branch == 1 else None
    first_row_id = None
    if with_first_row_id:
        branch = _decode_long(buf)
        first_row_id = _decode_long(buf) if branch == 1 else None
    stats = json.loads(_decode_string(buf))
    return {
        "path": path,
        "row_count": row_count,
        "size_bytes": size_bytes,
        "added_by": added_by,
        "first_row_id": first_row_id,
        "stats": stats,
    }


# ------------------------------------------------------------- container IO

def write_manifest_avro(
    full_path: str, records: list[dict], codec: str = "deflate"
) -> None:
    """Write manifest entries as one Avro container file (atomic tmp+rename)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = uuid.uuid4().bytes  # 16-byte block delimiter
    meta = {
        "avro.schema": MANIFEST_SCHEMA_JSON.encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _encode_long(len(meta))
    for k, v in sorted(meta.items()):
        out += _encode_string(k)
        out += _encode_long(len(v)) + v
    out += _encode_long(0)  # metadata map terminator
    out += sync

    if records:
        payload = b"".join(_encode_entry(r) for r in records)
        if codec == "deflate":  # avro deflate = raw DEFLATE (no zlib header)
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        out += _encode_long(len(records))
        out += _encode_long(len(payload))
        out += payload
        out += sync

    tmp = full_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.rename(tmp, full_path)


def read_manifest_avro(full_path: str) -> list[dict]:
    with open(full_path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{full_path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _decode_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count form: long byte size follows
            n = -n
            _decode_long(buf)
        for _ in range(n):
            k = _decode_string(buf)
            vlen = _decode_long(buf)
            meta[k] = buf.read(vlen)
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"].decode())
    file_fields = [f["name"] for f in schema.get("fields", [])]
    if file_fields == _V2_FIELD_NAMES:
        with_frid = True
    elif file_fields == _V1_FIELD_NAMES:  # pre-row-lineage manifests
        with_frid = False
    else:
        raise ValueError(f"{full_path}: unexpected manifest schema")
    sync = buf.read(16)

    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _decode_long(buf)
        size = _decode_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode_entry(bbuf, with_first_row_id=with_frid))
        if buf.read(16) != sync:
            raise ValueError(f"{full_path}: sync marker mismatch (corrupt block)")
    return records
