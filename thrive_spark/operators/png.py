"""Pure-Python PNG codec (r11) — closes the lossless half of the
compressed-image boundary using only stdlib zlib + numpy.

Scope (honest, and asserted by the decoder):

- DECODE: non-interlaced, bit-depth-8 PNG in color types 0 (gray),
  2 (RGB), 3 (palette via PLTE), 4 (gray+alpha), 6 (RGBA); all five
  scanline filters (None/Sub/Up/Average/Paeth); multi-IDAT streams;
  CRC verification on every chunk. Adam7 interlace and bit depths
  1/2/4/16 raise NotImplementedError — the remaining boundary is
  those variants, no longer "PNG".
- ENCODE: color types 0/2/6 at bit depth 8, per-scanline adaptive
  filtering (minimum-sum-of-absolute-differences heuristic, the
  libpng default; ties break to the LOWEST filter id — deterministic)
  and a fixed zlib level, so encode(px) is byte-stable across runs.

Unlike the JPEG path (operators/jpeg.py), PNG is LOSSLESS, so the
Spark operator's oracle can predict the md5 of the DECODED pixel
buffer from the source bytes in plain SQL — the hash check covers the
actual pixel payload, not just geometry. Spark integration lives in
operators/multimodal.py; this module is plain numpy/zlib so tests can
exercise the codec directly (tests/test_multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per color type (bit depth 8)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (int16 inputs)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(px: np.ndarray, level: int = 6) -> bytes:
    """Encode (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA uint8 as a
    non-interlaced bit-depth-8 PNG with adaptive scanline filters."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, ch = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    raw = px.reshape(h, w * ch).astype(np.int16)
    prior = np.zeros(w * ch, dtype=np.int16)
    # left-neighbor offset is one PIXEL (ch bytes), per the spec
    out_lines = []
    for y in range(h):
        line = raw[y]
        left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int16), prior[:-ch]])
        cands = (
            line,  # 0 None
            line - left,  # 1 Sub
            line - prior,  # 2 Up
            line - ((left + prior) >> 1),  # 3 Average
            line - _paeth(left, prior, upleft),  # 4 Paeth
        )
        best_f, best = 0, None
        for f, c in enumerate(cands):
            b = (c & 0xFF).astype(np.uint8)
            # MSAD heuristic: bytes as signed, sum of magnitudes
            score = int(np.abs(b.astype(np.int8).astype(np.int64)).sum())
            if best is None or score < best[0]:
                best_f, best = f, (score, b)
        out_lines.append(bytes([best_f]) + best[1].tobytes())
        prior = line
    idat = zlib.compress(b"".join(out_lines), level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (see module docstring for the supported subset) to
    an (H, W, channels) uint8 array. Palette images are expanded to
    RGB through PLTE."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlaced PNG")
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"bad color type {color_type}")
            ihdr = (w, h, color_type)
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, color_type = ihdr
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = int(filters[y])
        line = lines[y, 1:].astype(np.int16)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: serial in x
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                if f == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (line[x] + ((a + prior[x]) >> 1)) & 0xFF
                else:
                    c = prior[x - ch] if x >= ch else 0
                    b = prior[x]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f} on line {y}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    px = out.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        px = plte[idx]
    return px
