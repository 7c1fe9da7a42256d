"""Zero-copy Arrow string-buffer views (shared by the dedup gram extraction
and the entropy bincount — one implementation of the offsets/data/lengths
unwrap so string/large_string and array-offset handling stay in one place).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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
