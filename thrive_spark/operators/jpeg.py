"""Pure-Python baseline JPEG codec (r11, verdict item 4) — closes the
"compressed-image decode" boundary without any image library.

Scope (honest, and asserted by the decoder):

- DECODE: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
  components with 1x1 sampling factors (4:4:4 or grayscale), standard
  DQT/DHT/DRI/RSTn handling. Progressive (SOF2), 12-bit, subsampled
  (4:2:0/4:2:2) and arithmetic-coded streams raise NotImplementedError
  — the remaining boundary is those variants, no longer "JPEG".
- ENCODE: baseline 4:4:4 with IJG-scaled Annex K quantization tables
  and FLAT 8-bit Huffman tables (every used symbol at code length 8).
  Flat tables cost compression ratio but are spec-legal — the decoder
  reads whatever DHT says, so it also decodes files using the standard
  Annex K.3.3 tables.

Determinism: every float stage (color convert, DCT/IDCT, quantize) is
fixed-order numpy with half-up rounding (np.floor(x + 0.5), never
np.round — house discipline), so encode(decode(encode(x))) is
bit-stable across runs; the multimodal_image_jpeg oracle relies on the
decoded MEANS staying within a fixed tolerance of the source image,
not on replaying the codec in SQL (lossy DCT math is not
SQL-expressible).

Spark integration lives in operators/multimodal.py; this module is
plain numpy so tests can exercise the codec directly
(tests/test_multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag() -> np.ndarray:
    # diagonal d = r+c: even diagonals run bottom-left -> top-right
    # (r descending), odd ones the reverse — the Annex A figure
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 reference quantization tables (row-major)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> clipped integer table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(1.0 / 2.0)
    return c * 0.5  # orthonormal: F = C f C^T matches the JPEG FDCT


DCT_C = _dct_matrix()

#: flat 8-bit Huffman tables: (bits, symbol list). DC: categories
#: 0..11; AC: EOB + every (run, size) with size 1..10 + ZRL — 162
#: symbols, all at code length 8 (valid: < 255 codes, so the all-ones
#: code never occurs).
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]


def _flat_table(symbols):
    bits = [0] * 16
    bits[7] = len(symbols)  # all codes length 8
    return bits, list(symbols)


def _canonical_codes(bits, vals):
    """(bits, vals) -> {symbol: (code, length)} per the canonical
    JPEG code assignment (Annex C)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits, vals):
    """(bits, vals) -> {(length, code): symbol} for bit-serial decode."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _split_ecs(data: bytes, pos: int) -> list[bytes]:
    """Entropy-coded segments from ``pos``: FF00-unstuffed, split at
    RSTn markers, ended by the first other marker (EOI / next
    segment). One O(n) pass touching only the FF bytes — the per-bit
    reader never has to think about stuffing or markers again (r16:
    this plus the canonical decode below replaced a bit-at-a-time
    reader that dominated the whole codec's profile)."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(data)
    while i < n:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            break
        cur += data[i:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # EOI or next segment header
            break
    segs.append(bytes(cur))
    return segs


class _SegReader:
    """MSB-first bit reader over one unstuffed entropy segment; bits
    past the end read as 0 (spec behavior for a truncated scan)."""

    __slots__ = ("seg", "n", "pos", "acc", "nbits")

    def __init__(self, seg: bytes):
        self.seg = seg
        self.n = len(seg)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _need(self, k: int) -> None:
        while self.nbits < k:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.seg[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # zero-pad past the segment
            self.nbits += 8

    def peek16(self) -> int:
        self._need(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._need(k)
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v


def _maxcodes(table: dict) -> list[int]:
    """Per code length 1..16, the largest canonical code (or -1 when
    the length is unused) — the T.81 F.16 DECODE fast path: the
    smallest L whose left-aligned 16-bit peek, truncated to L bits,
    is <= maxcode[L] names the symbol's length in one compare per
    length instead of one dict probe per BIT."""
    mm = [-1] * 17
    for (length, code) in table:
        if code > mm[length]:
            mm[length] = code
    return mm


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[..., 0]
    cb = planes[..., 1] - 128.0
    cr = planes[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n_blocks, 8, 8) in MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _deblockify(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8, w8)
    )


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W, 3) or (H, W) uint8 array as a baseline
    sequential 4:4:4 (or grayscale) JFIF-less JPEG."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad dimensions {w}x{h}")
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    planes = (
        px[..., None].astype(np.float64)
        if gray
        else _rgb_to_ycbcr(px)
    )
    planes = np.pad(
        planes, ((0, h8 - h), (0, w8 - w), (0, 0)), mode="edge"
    )
    n_comp = 1 if gray else 3
    qts = [_scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)]
    dc_codes = _canonical_codes(*_flat_table(_DC_SYMS))
    ac_codes = _canonical_codes(*_flat_table(_AC_SYMS))

    # batched FDCT + quantization per component, zigzagged
    comp_coef = []
    for ci in range(n_comp):
        blocks = _blockify(planes[..., ci]) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", DCT_C, blocks, DCT_C)
        q = qts[0 if ci == 0 else 1].reshape(8, 8).astype(np.float64)
        # half-away-from-zero: sign * floor(|c|/q + 0.5) — deterministic;
        # clip to the baseline coefficient range so AC categories stay
        # <= 10 (reachable only at quality ~100 on adversarial blocks)
        quant = np.clip(
            (np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)).astype(
                np.int64
            ),
            -1023,
            1023,
        )
        comp_coef.append(quant.reshape(-1, 64)[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for tid in range(2 if n_comp == 3 else 1):
        seg(0xDB, bytes([tid]) + bytes(qts[tid][ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    for tc in (0, 1):  # DC then AC, one class pair shared by all comps
        bits, vals = _flat_table(_DC_SYMS if tc == 0 else _AC_SYMS)
        seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * n_comp
    n_mcu = (h8 // 8) * (w8 // 8)
    for mcu in range(n_mcu):
        for ci in range(n_comp):
            zz = comp_coef[ci][mcu]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size = _category(diff)
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(
                    diff if diff > 0 else diff + (1 << size) - 1, size
                )
            nz = np.nonzero(zz[1:])[0]
            prev = 0
            for k in nz:
                run = int(k) - prev
                prev = int(k) + 1
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                v = int(zz[1 + k])
                size = _category(v)
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(v if v > 0 else v + (1 << size) - 1, size)
            if prev < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (see module docstring for the
    supported subset) to an (H, W, n_comp) uint8 array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # spec B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker; skip them so foreign encoders' padding parses (the
        # marker byte is the first non-0xFF after the run)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        length = struct.unpack(">H", data[pos : pos + 2])[0]
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl[UNZIGZAG]  # stored zigzagged
                p += 65
        elif marker == 0xC4:  # DHT: one or more tables
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, n_comp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for ci in range(n_comp):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (only 4:4:4/grayscale)"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for ci in range(ns):
                cs, tables = payload[1 + 2 * ci : 3 + 2 * ci]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append(
                    (comp, huff[(0, tables >> 4)], huff[(1, tables & 0xF)])
                )
            return _decode_scan(
                data, pos, frame, scan, qt, restart_interval
            )
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    h, w = frame["h"], frame["w"]
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    n_mcu = (h8 // 8) * (w8 // 8)
    n_comp = len(scan)
    coef = np.zeros((n_comp, n_mcu, 64), dtype=np.int64)
    segs = _split_ecs(data, pos)
    seg_idx = 0
    br = _SegReader(segs[0])
    # canonical maxcode arrays, one per distinct table
    mm: dict[int, list[int]] = {}
    for _comp, dc_tbl, ac_tbl in scan:
        for t in (dc_tbl, ac_tbl):
            if id(t) not in mm:
                mm[id(t)] = _maxcodes(t)
    pred = [0] * n_comp
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # restart: next entropy segment, predictors reset
            seg_idx += 1
            br = _SegReader(
                segs[seg_idx] if seg_idx < len(segs) else b""
            )
            pred = [0] * n_comp
        for ci, (_comp, dc_tbl, ac_tbl) in enumerate(scan):
            dc_mm = mm[id(dc_tbl)]
            ac_mm = mm[id(ac_tbl)]
            v16 = br.peek16()
            for length in range(1, 17):
                code = v16 >> (16 - length)
                if code <= dc_mm[length]:
                    size = dc_tbl.get((length, code))
                    if size is None:  # corrupt stream: gap below min
                        raise ValueError("invalid Huffman code")
                    br.skip(length)
                    break
            else:
                raise ValueError("invalid Huffman code")
            diff = _extend(br.read_bits(size), size)
            pred[ci] += diff
            zz = [0] * 64
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                v16 = br.peek16()
                for length in range(1, 17):
                    code = v16 >> (16 - length)
                    if code <= ac_mm[length]:
                        rs = ac_tbl.get((length, code))
                        if rs is None:
                            raise ValueError("invalid Huffman code")
                        br.skip(length)
                        break
                else:
                    raise ValueError("invalid Huffman code")
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError(f"bad AC symbol {rs:#x}")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("coefficient index overflow")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            coef[ci, mcu] = zz
    planes = np.empty((h8, w8, n_comp), dtype=np.float64)
    for ci, (comp, _dc, _ac) in enumerate(scan):
        q = qt[comp["tq"]].astype(np.float64)
        blocks = (coef[ci][:, UNZIGZAG] * q).reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,yv->nxy", DCT_C.T, blocks, DCT_C.T)
        planes[..., ci] = _deblockify(spatial, h8, w8) + 128.0
    planes = planes[:h, :w]
    if n_comp == 3:
        return _ycbcr_to_rgb(planes)
    return np.clip(np.floor(planes + 0.5), 0, 255).astype(np.uint8)
