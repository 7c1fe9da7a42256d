"""Zero-copy Arrow string-buffer views (shared by the dedup gram extraction
and the entropy bincount — one implementation of the offsets/data/lengths
unwrap so string/large_string and array-offset handling stay in one place).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_u64(col) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over every string of an Arrow string array.

    One numpy pass per byte POSITION (bounded by the longest string, with a
    progressively shrinking alive set), instead of one Python-level digest
    per string — the scale path for hashing many short keys (words, spans,
    user ids).  For few long strings (whole documents) a per-row C-level md5
    is cheaper; use this only when count >> length."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets, data, lengths = string_buffer_views(arr)
    n = len(lengths)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0 or offsets[-1] == offsets[0]:
        return h
    starts = offsets[:-1]
    maxlen = int(lengths.max())
    last = len(data) - 1
    with np.errstate(over="ignore"):
        if (maxlen <= 32 and n * maxlen <= (1 << 27)
                and len(data) < (1 << 31) - 64):
            # short-key fast path (words, ids): ONE gather into an
            # (n, maxlen) Fortran-order byte matrix (columns contiguous),
            # then maxlen arithmetic rounds on preallocated scratch — no
            # per-round fancy indexing.  int32 index matrix (half the
            # transient footprint); only the tail rows that could read past
            # the buffer end get clipped (offsets are non-decreasing)
            idx = starts.astype(np.int32)[:, None] + np.arange(
                maxlen, dtype=np.int32)
            over = int(np.searchsorted(starts, last - maxlen + 1))
            if over < n:
                np.minimum(idx[over:], np.int32(last), out=idx[over:])
            mat = np.asfortranarray(data[idx])
            c = np.empty(n, dtype=np.uint64)
            hx = np.empty(n, dtype=np.uint64)
            for i in range(maxlen):
                c[:] = mat[:, i]
                np.bitwise_xor(h, c, out=hx)
                np.multiply(hx, FNV_PRIME, out=hx)
                np.copyto(h, hx, where=lengths > i)
        elif maxlen <= 64:
            # mid-size keys: maxlen full-width rounds of gather + masked
            # select, reusing preallocated scratch
            idx = np.empty_like(starts)
            c = np.empty(n, dtype=np.uint64)
            hx = np.empty(n, dtype=np.uint64)
            for i in range(maxlen):
                np.minimum(starts + i, last, out=idx)
                c[:] = data[idx]
                np.bitwise_xor(h, c, out=hx)
                np.multiply(hx, FNV_PRIME, out=hx)
                np.copyto(h, hx, where=lengths > i)
        else:
            alive = np.flatnonzero(lengths > 0)
            i = 0
            while alive.size:
                c = data[starts[alive] + i].astype(np.uint64)
                h[alive] = (h[alive] ^ c) * FNV_PRIME
                i += 1
                alive = alive[lengths[alive] > i]
    return h


def string_buffer_views(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(offsets, data, lengths) for a string column/array, zero-copy.

    ``offsets`` are absolute into ``data`` (int64, length n+1); ``lengths``
    is their diff.  Handles chunked input, large_string offsets, and a
    non-zero array offset."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offsets, data, np.diff(offsets)
