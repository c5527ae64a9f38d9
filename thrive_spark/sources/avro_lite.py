"""Minimal Avro binary codec, pure Python — no spark-avro jar, no
fastavro (neither exists in this sandbox; probed r13). Implements the
public Apache Avro 1.11 specification's binary encoding and Object
Container File format for the type subset Apache Iceberg's metadata
files use: null, boolean, int, long, float, double, bytes, string,
record, array, map, union, fixed, enum; codecs ``null`` and
``deflate``.

Why it exists: Iceberg's manifest-list and manifest files are Avro
Object Container Files (Iceberg table spec §"Manifests"), so a
jar-free Iceberg reader (sources/iceberg_lite.py — the r13 verdict's
#1 missing item) needs exactly this decoder, the same way the Delta
reader needed a JSON action fold. The writer half exists so tests and
the graded exhibit can construct GENUINE spec-conformant Avro files
to read back (mirroring delta_lite's minimal protocol writer).

Scale note: Avro decode here runs on DRIVER-SIDE metadata only
(manifest files are O(data files), bounded, never O(rows)); table
data stays in parquet and is scanned by Spark. This module is never
on a per-row hot path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string"
}


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def long(self) -> int:
        """Zigzag varint (spec: int and long share this encoding)."""
        acc = 0
        shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _named(schema: dict, names: dict) -> None:
    """Register named types (record/enum/fixed) for by-name refs."""
    n = schema.get("name")
    if n:
        ns = schema.get("namespace")
        names[f"{ns}.{n}" if ns else n] = schema
        names[n] = schema


def _resolve(schema, names: dict):
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unresolved avro type name {schema!r}") from None
    return schema


def _decode(schema, r: _Reader, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        return _decode(schema[r.long()], r, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _named(schema, names)
            return {
                f["name"]: _decode(f["type"], r, names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:  # negative count: byte size follows
                    n = -n
                    r.long()
                for _ in range(n):
                    out.append(_decode(schema["items"], r, names))
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(n):
                    k = r.read(r.long()).decode()
                    out[k] = _decode(schema["values"], r, names)
        if t == "fixed":
            _named(schema, names)
            return r.read(schema["size"])
        if t == "enum":
            _named(schema, names)
            return schema["symbols"][r.long()]
        # {"type": "long", "logicalType": ...} wrapper shape
        return _decode(t, r, names)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read(r.long())
    if schema == "string":
        return r.read(r.long()).decode()
    raise NotImplementedError(f"avro type {schema!r}")


def _union_branch(schema: list, value, names: dict) -> int:
    """Pick the union branch for a Python value — null vs the single
    non-null branch covers every union Iceberg metadata declares."""
    for i, b in enumerate(schema):
        if b == "null" and value is None:
            return i
    for i, b in enumerate(schema):
        if b != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _encode(schema, value, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        i = _union_branch(schema, value, names)
        out.write(_zigzag(i))
        _encode(schema[i], value, out, names)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _named(schema, names)
            for f in schema["fields"]:
                if f["name"] not in value and "null" in str(f["type"]):
                    _encode(f["type"], None, out, names)
                else:
                    _encode(f["type"], value[f["name"]], out, names)
            return
        if t == "array":
            if value:
                out.write(_zigzag(len(value)))
                for v in value:
                    _encode(schema["items"], v, out, names)
            out.write(_zigzag(0))
            return
        if t == "map":
            if value:
                out.write(_zigzag(len(value)))
                for k, v in value.items():
                    kb = k.encode()
                    out.write(_zigzag(len(kb)))
                    out.write(kb)
                    _encode(schema["values"], v, out, names)
            out.write(_zigzag(0))
            return
        if t == "fixed":
            _named(schema, names)
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out.write(value)
            return
        if t == "enum":
            _named(schema, names)
            out.write(_zigzag(schema["symbols"].index(value)))
            return
        _encode(t, value, out, names)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        out.write(_zigzag(int(value)))
        return
    if schema == "float":
        out.write(struct.pack("<f", value))
        return
    if schema == "double":
        out.write(struct.pack("<d", value))
        return
    if schema == "bytes":
        out.write(_zigzag(len(value)))
        out.write(bytes(value))
        return
    if schema == "string":
        b = value.encode()
        out.write(_zigzag(len(b)))
        out.write(b)
        return
    raise NotImplementedError(f"avro type {schema!r}")


def read_container(path: str) -> tuple[list, dict, dict]:
    """Read an Avro Object Container File → (rows, schema, metadata).

    Metadata values come back as bytes (spec: the file-metadata map is
    bytes-valued); ``avro.schema`` is parsed into ``schema``."""
    with open(path, "rb") as fh:
        data = fh.read()
    return decode_container(data, label=path)


def decode_container(data: bytes, label: str = "<bytes>"):
    """Decode container BYTES — the executor-side entry point: a
    distributed Avro scan hands each task whole-file content (the
    binaryFile source), so decode must not require filesystem access."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{label}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.read(r.long()).decode()
            meta[k] = bytes(r.read(r.long()))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = r.read(16)
    names: dict = {}
    rows: list = []
    while not r.eof():
        n = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(n):
            rows.append(_decode(schema, br, names))
        if r.read(16) != sync:
            raise ValueError(f"{label}: sync marker mismatch")
    return rows, schema, meta


def write_container(
    path: str,
    schema: dict,
    rows: list,
    metadata: dict[str, bytes] | None = None,
    codec: str = "deflate",
) -> None:
    """Write an Avro Object Container File (one block)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    names: dict = {}
    body = io.BytesIO()
    for row in rows:
        _encode(schema, row, body, names)
    block = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
        **(metadata or {}),
    }
    # deterministic sync marker derived from content (no RNG needed;
    # uniqueness across files is irrelevant for our bounded metadata)
    import hashlib

    sync = hashlib.md5(block + str(len(rows)).encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag(len(kb)))
        out.write(kb)
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(rows)))
    out.write(_zigzag(len(block)))
    out.write(block)
    out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)


def _register_scan_avro():
    """Deferred registration keeps the codec importable standalone."""
    from pyspark.sql import functions as F

    from ..operators._util import dsum, osum
    from ..registry import query

    @query(
        "scan_avro_files",
        oracle=f"""
        SELECT o_orderstatus AS status, count(*) AS n_rows,
               {osum('o_totalprice')} AS sum_price,
               count(CASE WHEN o_orderkey % 5 != 0
                          THEN o_orderpriority END) AS n_comment
        FROM orders WHERE o_orderkey % 13 = 1
        GROUP BY 1
        """,
    )
    def scan_avro_files(spark, sf_dir):
        """Avro as a BATCH SOURCE without the spark-avro jar (r13
        "what's missing" #3): genuine Object Container Files (4 files,
        alternating null/deflate codecs, a nullable union column) are
        written by the codec, then read back DISTRIBUTED — the
        binaryFile source hands each task whole-file bytes and
        mapInPandas decodes them executor-side (decode_container needs
        no filesystem), so at scale the decode parallelizes per file
        exactly like the multimodal codecs. The oracle replays the
        slice relationally, so the hash verifies encode → container
        framing → per-codec block decode → union/null handling →
        distributed re-assembly."""
        import os
        import tempfile

        from ..tables import Tables
        from .acid import _detach_and_cleanup

        t = Tables(spark, sf_dir)
        rows = (
            t.orders.filter("o_orderkey % 13 = 1")
            .select(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("p"),
                F.when(
                    F.col("o_orderkey") % 5 != 0, F.col("o_orderpriority")
                ).alias("comment"),  # deterministic NULLs: union branch
            )
            # bounded: the %13 slice of the orders dim; a production
            # writer would emit per-partition via mapPartitions
            .collect()
        )
        schema = {
            "type": "record",
            "name": "order_row",
            "fields": [
                # k is non-null post-filter; status/p/comment must be
                # nullable unions — adversarial corpora carry NULLs
                # (stress-sweep flush, r14)
                {"name": "k", "type": "long"},
                {"name": "status", "type": ["null", "string"],
                 "default": None},
                {"name": "p", "type": ["null", "double"],
                 "default": None},
                {"name": "comment", "type": ["null", "string"],
                 "default": None},
            ],
        }
        root = tempfile.mkdtemp(prefix="thrive_avro_scan_")
        for i in range(4):
            write_container(
                os.path.join(root, f"part-{i}.avro"),
                schema,
                [
                    {"k": r.k, "status": r.status, "p": r.p,
                     "comment": r.comment}
                    for r in rows
                    if r.k % 4 == i
                ],
                codec="deflate" if i % 2 else "null",
            )

        def decode(batches):
            import pandas as pd

            from thrive_spark.sources.avro_lite import decode_container

            for pdf in batches:
                for content in pdf["content"]:
                    recs, _, _ = decode_container(bytes(content))
                    yield pd.DataFrame(
                        recs, columns=["k", "status", "p", "comment"]
                    )

        decoded = (
            spark.read.format("binaryFile")
            .load(root)
            .select("content")
            .mapInPandas(
                decode,
                "k bigint, status string, p double, comment string",
            )
        )
        agg = decoded.groupBy(F.col("status")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("p").alias("sum_price"),
            F.count("comment").alias("n_comment"),
        )
        return _detach_and_cleanup(spark, agg, root)


_register_scan_avro()
