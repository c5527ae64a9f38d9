"""Delta deletion-vector sidecars, pure Python (r14; replaces the
blanket reader-v3 NotImplementedError in delta_lite — r13 verdict #5).

A deletion vector marks rows of a parquet data file as deleted WITHOUT
rewriting the file: the add action carries a ``deletionVector``
descriptor pointing at (or inlining) a serialized 64-bit
RoaringBitmap of deleted row indices. Everything here follows the
public Delta protocol spec (delta.io PROTOCOL.md, "Deletion Vectors")
and the public RoaringBitmap format spec
(github.com/RoaringBitmap/RoaringFormatSpec):

- descriptor: ``{storageType, pathOrInlineDv, offset, sizeInBytes,
  cardinality}`` — storageType ``i`` (Z85-inline), ``p`` (absolute
  path), ``u`` (table-relative: pathOrInlineDv = optional random
  prefix + Z85-encoded UUID; file = <prefix>/deletion_vector_<uuid>.bin)
- DV file: 1-byte format version (1), then per DV
  ``[int32 BE dataSize][data][int32 BE crc32-of-data]`` with
  ``offset`` pointing at the dataSize word
- data: ``[int32 LE magic 1681511377][RoaringBitmapArray portable]``
  where portable = int64 LE bucket count, then per bucket
  ``int32 LE high32-key`` + a standard 32-bit roaring bitmap
- 32-bit roaring: cookie 12346 (no runs, explicit size + offset
  table) or 12347 (run flags in the cookie header); array, bitmap and
  run containers all decode; the writer emits 12346 with array or
  bitmap containers (runs are an encoding optimization, never needed
  for correctness)

Scale shape: bitmap decode is per-FILE metadata (cardinality-bounded,
driver- or task-side), and the actual row drop is a distributed
anti-join on (file, _metadata.row_index) — see delta_lite.snapshot.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

DV_MAGIC = 1681511377
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85 over zero-padded input (the Delta codec's padding
    rule: pad to a 4-byte multiple; the descriptor's sizeInBytes says
    where the real data ends)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        v = struct.unpack(">I", data[i : i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, n_bytes: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += struct.pack(">I", v)
    return bytes(out[:n_bytes] if n_bytes is not None else out)


# ---------- 32-bit roaring (standard serialization) ----------

_COOKIE_RUNS = 12347
_COOKIE_NO_RUNS = 12346
_NO_OFFSET_THRESHOLD = 4


def _rb32_decode(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one standard 32-bit roaring bitmap at ``pos``; returns
    (sorted values, next position)."""
    cookie = struct.unpack_from("<i", buf, pos)[0]
    pos += 4
    if cookie & 0xFFFF == _COOKIE_RUNS:
        size = (cookie >> 16) + 1
        nrun_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + nrun_bytes]
        pos += nrun_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUNS:
        size = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for i in range(size):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((k, c + 1))
    if has_offsets:
        pos += 4 * size  # offset table — containers follow in order
    vals: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        base = k << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                vals.extend(base + start + j for j in range(length + 1))
        elif card > 4096:  # bitmap container: 8 KiB
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    vals.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array container
            arr = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            vals.extend(base + v for v in arr)
    return vals, pos


def _rb32_encode(values: list[int]) -> bytes:
    """Encode sorted uint32 values as a no-run-cookie roaring bitmap
    (array containers ≤4096, bitmap containers above)."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NO_RUNS, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    containers = []
    for k in keys:
        lows = sorted(by_key[k])
        if len(lows) > 4096:
            words = [0] * 1024
            for v in lows:
                words[v >> 6] |= 1 << (v & 63)
            containers.append(struct.pack("<1024Q", *words))
        else:
            containers.append(struct.pack(f"<{len(lows)}H", *lows))
    off = len(out) + 4 * len(keys)
    for c in containers:
        out += struct.pack("<i", off)
        off += len(c)
    for c in containers:
        out += c
    return bytes(out)


def bitmap_serialize(row_indices) -> bytes:
    """Serialized DV data: magic + RoaringBitmapArray portable."""
    by_high: dict[int, list[int]] = {}
    for r in row_indices:
        if r < 0:
            raise ValueError("row index must be non-negative")
        by_high.setdefault(r >> 32, []).append(r & 0xFFFFFFFF)
    out = bytearray(struct.pack("<i", DV_MAGIC))
    out += struct.pack("<q", len(by_high))
    for hi in sorted(by_high):
        out += struct.pack("<i", hi)
        out += _rb32_encode(sorted(by_high[hi]))
    return bytes(out)


def bitmap_deserialize(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic}")
    (n,) = struct.unpack_from("<q", data, 4)
    pos = 12
    vals: list[int] = []
    for _ in range(n):
        (hi,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lows, pos = _rb32_decode(data, pos)
        vals.extend((hi << 32) | v for v in lows)
    return sorted(vals)


# ---------- descriptor-level read/write ----------

def _dv_file_path(root: str, path_or_inline: str) -> str:
    """storageType 'u': optional random prefix + Z85 UUID (20 chars)."""
    z = path_or_inline[-20:]
    prefix = path_or_inline[:-20]
    u = _uuid.UUID(bytes=z85_decode(z, 16))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(root, prefix, name) if prefix else os.path.join(
        root, name
    )


def read_dv(root: str, descriptor: dict) -> list[int]:
    """Deleted row indices for one descriptor (any storageType)."""
    st = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"], size)
        return bitmap_deserialize(data)
    if st == "p":
        path = descriptor["pathOrInlineDv"]
    elif st == "u":
        path = _dv_file_path(root, descriptor["pathOrInlineDv"])
    else:
        raise NotImplementedError(f"DV storageType {st!r}")
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[0] != 1:
        raise ValueError(f"DV file format version {blob[0]}")
    off = int(descriptor["offset"])
    (dsz,) = struct.unpack_from(">i", blob, off)
    if dsz != size:
        raise ValueError(f"DV size mismatch: file {dsz} vs descriptor {size}")
    data = blob[off + 4 : off + 4 + dsz]
    (crc,) = struct.unpack_from(">i", blob, off + 4 + dsz)
    if (crc & 0xFFFFFFFF) != zlib.crc32(data):
        raise ValueError("DV checksum mismatch")
    return bitmap_deserialize(data)


def write_dv(
    root: str, row_indices, inline: bool = False
) -> dict:
    """Serialize row indices into a descriptor (+ sidecar file for the
    on-disk 'u' form); cardinality per spec."""
    data = bitmap_serialize(sorted(set(row_indices)))
    card = len(set(row_indices))
    if inline:
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data),
            "offset": None,
            "sizeInBytes": len(data),
            "cardinality": card,
        }
    u = _uuid.uuid4()
    path = os.path.join(root, f"deletion_vector_{u}.bin")
    blob = bytearray(b"\x01")
    offset = len(blob)
    blob += struct.pack(">i", len(data))
    blob += data
    blob += struct.pack(">I", zlib.crc32(data))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": card,
    }
