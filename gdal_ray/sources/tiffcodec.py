"""TIFF chunk codecs: LZW (Compression=5), PackBits (32773), Predictor=2.

From-scratch implementations of the public TIFF 6.0 spec algorithms
(§13 LZW with the early-change convention libtiff/GDAL use, §9 PackBits,
§14 horizontal differencing predictor) — the decode path that unlocks
reading most real-world GeoTIFFs (reference surface:
``frmts/gtiff/geotiff.cpp`` COMPRESS=LZW/PACKBITS + TIFFTAG_PREDICTOR).

Chunks are tile- or strip-sized (tens of KiB): these run inside
``map_batches`` workers per chunk, so pure-Python LZW throughput
(~10 MB/s) parallelizes across the actor pool; the wide path for new
data remains deflate.
"""
from __future__ import annotations

import numpy as np

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF LZW decode (MSB-first bit order, 9->12 bit codes, early
    change: the code width bumps one entry BEFORE the table fills)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    width = 9
    next_code = 258
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            bitbuf &= (1 << nbits) - 1  # drop consumed bits: keep the
            # accumulator small-int (unbounded growth is O(n^2))
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError(f"corrupt LZW stream: code {code} "
                                 f"> next {next_code}")
            out += entry
            prev = entry
            # early change: widen when the NEXT code would not fit
            if next_code + 1 >= (1 << width) and width < 12:
                width += 1
            if max_out is not None and len(out) >= max_out:
                return bytes(out[:max_out])
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encode (early-change, table reset at 4094)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1  # same small-int guarantee

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # early change: encoder widens at next_code == (1 << width) — one
        # entry AFTER the decoder's (1 << width) - 1, because the decoder's
        # table lags the encoder's by exactly one entry at each read
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF PackBits (Apple RLE, TIFF 6.0 §9)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:          # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:        # repeat next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
        if max_out is not None and len(out) >= max_out:
            return bytes(out[:max_out])
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits encoder (runs >= 3 become repeats)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal: until the next >=3 run or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def predictor2_decode(raw: bytes, width: int, height: int,
                      dtype: np.dtype, en: str = "<",
                      samples: int = 1) -> bytes:
    """Undo horizontal differencing (Predictor=2): cumulative sum along
    rows with wraparound integer arithmetic.  ``width`` counts SAMPLES
    per row (pixels * samples for chunky multi-band); the delta is
    between corresponding samples of adjacent pixels (TIFF 6.0 §14)."""
    dt = np.dtype(dtype).newbyteorder(en)
    a = np.frombuffer(raw, dtype=dt).reshape(height, width).copy()
    if samples == 1:
        np.cumsum(a.view(a.dtype), axis=1, out=a,
                  dtype=a.dtype)  # modular wrap matches per-pixel adds
    else:
        b = a.reshape(height, width // samples, samples)
        np.cumsum(b, axis=1, out=b, dtype=b.dtype)
    return a.astype(np.dtype(dtype).newbyteorder(en), copy=False).tobytes()


def predictor2_encode(raw: bytes, width: int, height: int,
                      dtype: np.dtype, en: str = "<",
                      samples: int = 1) -> bytes:
    """Apply horizontal differencing (Predictor=2)."""
    dt = np.dtype(dtype).newbyteorder(en)
    a = np.frombuffer(raw, dtype=dt).reshape(height, width).copy()
    if samples == 1:
        a[:, 1:] = a[:, 1:] - a[:, :-1]
    else:
        b = a.reshape(height, width // samples, samples)
        b[:, 1:] = b[:, 1:] - b[:, :-1]
    return a.tobytes()
