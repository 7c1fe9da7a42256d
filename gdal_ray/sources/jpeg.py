"""Baseline JPEG codec (JFIF, SOF0) — dependency-free, from the public spec.

Closes the round-3 missing item "compressed media codecs": the container has
no Pillow/libjpeg, so DecodeBackend("real") previously covered only the
in-repo PNG/WAV/AVI formats while real corpora are JPEG-heavy.  This module
implements the ITU-T T.81 baseline process from the published spec (Annex K
default quantization/Huffman tables, zigzag order, byte stuffing, YCbCr
per JFIF 1.02):

- ``encode_baseline(arr, quality)``: grayscale (H,W) or RGB (H,W,3) uint8 ->
  JFIF bytes.  4:4:4 (no chroma subsampling) so every component shares the
  MCU grid.
- ``decode_baseline(buf)``: SOF0 JFIF bytes -> (H,W) or (H,W,3) uint8.
  Accepts 1- or 3-component 4:4:4 streams with restart markers absent.

Reference surface: frmts/jpeg/jpgdataset.cpp (GDAL's JPEG driver, which
delegates to libjpeg); this is an independent implementation of the same
published format.  The DCT is an exact float64 matrix DCT-II; per-blob
Huffman decode is necessarily sequential, so corpus-scale decode
parallelism comes from the actor-pool ``map_batches`` stage over blobs
(stages/media.py), not from inside one blob.

Exactness note for oracles: an image whose every aligned 8x8 block is a
CONSTANT value round-trips EXACTLY at quality >= 75 (DC quant step <= 8) (only the DC coefficient
is non-zero and the IDCT of a pure-DC block is constant), which gives the
driver queries a bit-stable SQL mirror through the full entropy pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

# -- Annex K tables ----------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order
# NOT applied; these are in natural row-major order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DCT_M = None


def _dct_matrix() -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        k = np.arange(8)[:, None]
        n = np.arange(8)[None, :]
        m = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _DCT_M = m
    return _DCT_M


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling (public formula): 1..100 -> table scale."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _build_huffman(bits, vals):
    """(code, size) per symbol value, canonical order (spec C.2)."""
    sizes = []
    for l, n in enumerate(bits, start=1):
        sizes += [l] * n
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int):
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient (spec F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_component_blocks(blocks_q: np.ndarray, dc_codes, ac_codes,
                             bw: _BitWriter, pred: int) -> int:
    """Entropy-encode quantized (N, 8, 8) blocks of one component
    interleaved call-by-call; returns the updated DC predictor."""
    for b in blocks_q:
        zz = b.ravel()[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size, bits = _magnitude(diff)
        c, l = dc_codes[size]
        bw.write(c, l)
        if size:
            bw.write(bits, size)
        nz = np.flatnonzero(zz[1:]) + 1
        last = 0
        for idx in nz:
            run = idx - last - 1
            while run >= 16:
                c, l = ac_codes[0xF0]  # ZRL
                bw.write(c, l)
                run -= 16
            size, bits = _magnitude(int(zz[idx]))
            c, l = ac_codes[(run << 4) | size]
            bw.write(c, l)
            bw.write(bits, size)
            last = idx
        if last != 63:
            c, l = ac_codes[0x00]  # EOB
            bw.write(c, l)
    return pred


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H,W) float -> (N,8,8) aligned blocks, edge-replicated padding."""
    h, w = plane.shape
    H = -(-h // 8) * 8
    W = -(-w // 8) * 8
    if (H, W) != (h, w):
        p = np.empty((H, W), plane.dtype)
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:h, w:] = plane[:, -1:]
        p[h:, w:] = plane[-1, -1]
        plane = p
    return (plane.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    H = -(-h // 8) * 8
    W = -(-w // 8) * 8
    full = (blocks.reshape(H // 8, W // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(H, W))
    return full[:h, :w]


def encode_baseline(arr: np.ndarray, quality: int = 85) -> bytes:
    """uint8 grayscale (H,W) or RGB (H,W,3) -> baseline JFIF bytes."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (H,W) or (H,W,3)")
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [_scale_qt(QT_LUMA, quality)]
    if not gray:
        qts.append(_scale_qt(QT_CHROMA, quality))
    D = _dct_matrix()
    comp_q = []
    for ci, plane in enumerate(planes):
        blocks = _blocks_of(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", D, blocks, D)
        qt = qts[min(ci, len(qts) - 1)].astype(np.float64)
        comp_q.append(np.round(coef / qt).astype(np.int64))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for i, qt in enumerate(qts):
        z = qt.ravel()[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, i) + z
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_l = _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dc_c = _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    nblocks = comp_q[0].shape[0]
    preds = [0] * ncomp
    for bi in range(nblocks):  # interleaved 4:4:4 MCUs = one block per comp
        for ci in range(ncomp):
            dc = dc_l if ci == 0 else dc_c
            ac = ac_l if ci == 0 else ac_c
            preds[ci] = _encode_component_blocks(
                comp_q[ci][bi:bi + 1], dc, ac, bw, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment (0xFF00 unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        while self.nbits < need:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1
                else:  # marker: treat as end (pad zeros)
                    self.pos = len(self.data)
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_table(bits, vals):
    """(maxcode/mincode/valptr per length) fast lookup per spec F.2.2.3."""
    codes = _build_huffman(bits, vals)
    # invert: length -> {code: symbol}
    by_len: dict = {}
    for sym, (code, l) in codes.items():
        by_len.setdefault(l, {})[code] = sym
    return by_len


def _read_symbol(br: _BitReader, by_len) -> int:
    code = 0
    for l in range(1, 17):
        code = (code << 1) | br.read(1)
        d = by_len.get(l)
        if d is not None and code in d:
            return d[code]
    raise ValueError("bad Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_baseline(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (H,W) or (H,W,3).  4:4:4 only."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    h = w = None
    comps = []
    scan = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                z = np.frombuffer(seg[p + 1:p + 65], np.uint8).astype(np.int64)
                qts[tq] = z[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("8-bit baseline only")
            for ci in range(nc):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                if samp != 0x11:
                    raise ValueError("4:4:4 (1x1 sampling) only")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("baseline SOF0 only")
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDA:
            ns = seg[0]
            sel = []
            for ci in range(ns):
                cid, tt = struct.unpack_from("BB", seg, 1 + 2 * ci)
                sel.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            scan = sel
            pos = pos + seglen
            break
        pos += seglen
    if scan is None or h is None:
        raise ValueError("missing SOS/SOF0")
    data = buf[pos:]
    br = _BitReader(data)
    ncomp = len(scan)
    nbx, nby = -(-w // 8), -(-h // 8)
    nblocks = nbx * nby
    coefs = [np.zeros((nblocks, 64), np.int64) for _ in range(ncomp)]
    preds = [0] * ncomp
    comp_by_id = {c["id"]: c for c in comps}
    for bi in range(nblocks):
        for ci, sc in enumerate(scan):
            dc_tbl = huff_dc[sc["dc"]]
            ac_tbl = huff_ac[sc["ac"]]
            size = _read_symbol(br, dc_tbl)
            diff = _extend(br.read(size), size)
            preds[ci] += diff
            zz = coefs[ci][bi]
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_tbl)
                r, s = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += r
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(br.read(s), s)
                k += 1
    D = _dct_matrix()
    planes = []
    for ci, sc in enumerate(scan):
        qt = qts[comp_by_id[sc["id"]]["tq"]].astype(np.float64)
        blocks = (coefs[ci][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
                  * qt)
        pix = np.einsum("ji,njk,kl->nil", D, blocks, D) + 128.0
        planes.append(_unblocks(pix, h, w))
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
