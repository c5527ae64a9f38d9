"""Puffin file format, pure Python — the Iceberg statistics/blob
container (public spec: iceberg.apache.org/puffin-spec) that format
VERSION 3 uses to carry DELETION VECTORS:

  Magic "PFA1"
  Blob₁ … Blobₙ                  raw bytes, addressed by the footer
  Magic "PFA1"
  FooterPayload                  JSON {"blobs":[…], "properties":{…}}
  FooterPayloadSize  (int32 LE)
  Flags              (4 bytes; bit 0 = footer compressed — we never
                      compress, and refuse compressed footers)
  Magic "PFA1"

Each footer blob entry: {"type", "fields", "snapshot-id",
"sequence-number", "offset", "length", "properties": {…}}.

The ``deletion-vector-v1`` blob (Iceberg v3 spec §Position Delete
Vectors) is deliberately byte-compatible with Delta Lake's deletion
vectors so one bitmap codec serves both formats:

  length   int32 BE   length of <magic + vector>
  magic    4 bytes    0xD1 0x33 0x39 0x64 (little-endian 1681511377)
  vector   64-bit RoaringBitmapArray "portable" serialization
  crc-32   int32 BE   zlib.crc32 over <magic + vector>

sources/deletion_vectors.py's ``bitmap_serialize`` emits exactly the
<magic + vector> segment (it is Delta's DV data layout), so this
module only adds the length/crc framing and the Puffin container —
the r14 verdict's point that the roaring machinery is reusable.

Blob properties carry ``referenced-data-file`` and ``cardinality``;
the manifest entry for a DV points into the Puffin file via
content_offset/content_size_in_bytes (manifest fields 143-145).

Scale shape: a DV decode is per-FILE metadata (cardinality-bounded),
the row drop stays the broadcast anti-join on
(_metadata.file_path, row_index) — identical to the v2 position
delete path and Delta DVs.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from .deletion_vectors import bitmap_deserialize, bitmap_serialize

PUFFIN_MAGIC = b"PFA1"


def dv_blob_segment(row_indices) -> bytes:
    """One deletion-vector-v1 blob: BE length + (magic + portable
    bitmap) + BE crc-32."""
    data = bitmap_serialize(sorted(set(row_indices)))
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data))
    )


def dv_blob_decode(segment: bytes) -> list[int]:
    """Deleted row indices from a deletion-vector-v1 blob segment;
    verifies framing and checksum."""
    (n,) = struct.unpack_from(">i", segment, 0)
    data = segment[4 : 4 + n]
    (crc,) = struct.unpack_from(">I", segment, 4 + n)
    if crc != zlib.crc32(data):
        raise ValueError("deletion vector checksum mismatch")
    return bitmap_deserialize(data)


def write_puffin(path: str, blobs: list[dict]) -> list[dict]:
    """Write a Puffin file. ``blobs``: [{"type": str, "data": bytes,
    "fields": [int], "snapshot-id": int, "sequence-number": int,
    "properties": {str: str}}]. Returns the footer's blob entries
    (offset/length filled in) so callers can stamp manifest
    pointers."""
    entries: list[dict] = []
    out = bytearray(PUFFIN_MAGIC)
    for b in blobs:
        entries.append({
            "type": b["type"],
            "fields": b.get("fields", []),
            "snapshot-id": b.get("snapshot-id", 0),
            "sequence-number": b.get("sequence-number", 0),
            "offset": len(out),
            "length": len(b["data"]),
            "properties": dict(b.get("properties") or {}),
        })
        out += b["data"]
    payload = json.dumps(
        {"blobs": entries, "properties": {"created-by": "thrive_spark"}},
        separators=(",", ":"),
    ).encode()
    out += PUFFIN_MAGIC
    out += payload
    out += struct.pack("<i", len(payload))
    out += b"\x00\x00\x00\x00"  # flags: footer not compressed
    out += PUFFIN_MAGIC
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)
    return entries


def read_puffin_footer(path: str) -> dict:
    """Footer payload ({"blobs": […], "properties": {…}})."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != PUFFIN_MAGIC or data[-4:] != PUFFIN_MAGIC:
        raise ValueError(f"{path}: not a Puffin file")
    flags = data[-8:-4]
    if flags[0] & 1:
        raise NotImplementedError("compressed Puffin footer")
    (psize,) = struct.unpack_from("<i", data, len(data) - 12)
    start = len(data) - 12 - psize
    if data[start - 4 : start] != PUFFIN_MAGIC:
        raise ValueError(f"{path}: footer magic mismatch")
    return json.loads(data[start : start + psize])


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(offset)
        return fh.read(length)
