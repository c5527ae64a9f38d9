"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (task brief: plumbing real, codec decode stubbed — the
container ships no image/audio libraries).

Pattern at 100 TB: binaries live in parquet binary columns (or object
storage with a path column); decode / feature-extract runs as
Arrow-batched ``mapInPandas`` so bytes stream through Python in
columnar batches without per-row serde. Partitioning: binaries are
large — keep ``spark.sql.files.maxPartitionBytes`` small enough that
a batch of decoded frames fits executor memory, and repartition by a
content key before shuffles so one executor never holds the whole
modality.

The synthetic corpus has no real media, so the "image" here is the
UTF-8 text payload treated as opaque bytes; ``decode_image_stub``
marks the codec boundary explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


def decode_image_stub(data: bytes) -> dict:
    """Codec boundary. With a real image library this would be
    ``PIL.Image.open(io.BytesIO(data))``; the container has none, so
    derive deterministic fake dimensions from the bytes. Raises
    NotImplementedError if asked for a real decode."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real decode path not wired: install path exists, see docstring"
        )
    except ImportError:
        pass
    return {
        "width": (data[0] % 64 + 1) if data else 0,
        "height": (data[-1] % 64 + 1) if data else 0,
        "n_channels": 3,
    }


@query(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           base64(encode(substr(text, 1, 8))) AS b64_prefix,
           md5(text) AS content_hash
    FROM documents
    """,
)
def multimodal_binary_features(spark, sf_dir):
    """Typed metadata over an opaque binary column — the part of the
    multimodal path that needs no codec: byte length, leading byte,
    base64 prefix, content hash. All JVM-side."""
    t = Tables(spark, sf_dir)
    bin_col = F.encode("text", "UTF-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(bin_col).cast("bigint").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("bigint").alias("first_byte"),
        F.base64(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("b64_prefix"),
        F.md5("text").alias("content_hash"),
    )


@query("multimodal_decode_stub")  # rows-only: stubbed codec output
def multimodal_decode_stub(spark, sf_dir):
    """Decode + feature-extract over binary batches via mapInPandas:
    real Arrow plumbing (binary column → per-batch bytes → struct-ish
    feature columns), stubbed codec (decode_image_stub)."""
    t = Tables(spark, sf_dir)

    def decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            metas = [decode_image_stub(b) for b in pdf["img"]]
            # 8-bin byte histogram as the stand-in feature vector,
            # serialized fixed-point (driver canonicalizer can't hash lists)
            feats = [
                ",".join(
                    str(v)
                    for v in (
                        np.floor(
                            np.bincount(
                                np.frombuffer(b, dtype=np.uint8) >> 5, minlength=8
                            )
                            / max(len(b), 1)
                            * 10000
                            + 0.5
                        ).astype(np.int64)
                    )
                )
                for b in pdf["img"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_channels": [m["n_channels"] for m in metas],
                    "feature": feats,
                }
            )

    src = t.documents.select("doc_id", F.encode("text", "UTF-8").alias("img"))
    return src.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, feature string",
    )


@query("multimodal_frame_sample")  # rows-only: frame explosion shape
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling: treat the binary as a sequence of
    fixed-size frames, emit every 4th frame's offset + checksum —
    the explode-to-frames plumbing (one row in, many out) that a real
    video pipeline needs, with the codec stubbed to byte slices."""
    t = Tables(spark, sf_dir)
    frame_size, stride = 32, 4

    def frames(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["img"]):
                n_frames = max(len(b) // frame_size, 1)
                for i in range(0, n_frames, stride):
                    chunk = bytes(b[i * frame_size : (i + 1) * frame_size])
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            len(chunk),
                            hashlib.md5(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_md5"]
            )

    src = t.documents.select("doc_id", F.encode("text", "UTF-8").alias("img"))
    return src.mapInPandas(
        frames, "doc_id long, frame_idx int, frame_bytes int, frame_md5 string"
    )
