"""Arrow IPC file source/sink — the explicit form of the reference's Arrow
stream surface (``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp``: zero-copy
batches capped at MAX_FEATURES_IN_BATCH = 65536, :2078-2079).

Write: one IPC file, record batches capped at ``batch_rows``.
Read: the file footer is the natural parallel manifest — one Ray task per
record batch index, each memory-mapping the file and materializing ONLY its
batch (zero-copy off the map), so the scan parallelizes like the byte-range
drivers (shapefile/gtiff manifests).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.ipc as pipc

import ray.data as rd

BATCH_ROWS = 65536  # ogrlayerarrow.cpp:2078 MAX_FEATURES_IN_BATCH


def write_ipc(table: pa.Table, path: str, batch_rows: int = BATCH_ROWS) -> int:
    """Write an Arrow IPC (Feather-v2-compatible) file; returns batch count."""
    batches = table.to_batches(max_chunksize=batch_rows)
    with pipc.new_file(path, table.schema) as w:
        for b in batches:
            w.write_batch(b)
    return len(batches)


def read_ipc(path: str, columns=None, with_batch_idx: bool = False) -> "rd.Dataset":
    """Parallel IPC read: footer -> batch count (driver, metadata-only);
    one task per batch index memory-maps and slices zero-copy.
    ``with_batch_idx`` appends the file batch index to every row."""
    with pa.memory_map(path) as mm:
        n_batches = pipc.open_file(mm).num_record_batches

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch["batch_idx"].to_pylist():
            with pa.memory_map(path) as m:
                t = pa.Table.from_batches(
                    [pipc.open_file(m).get_batch(i)])
            if columns:
                t = t.select(columns)
            if with_batch_idx:
                t = t.append_column(
                    "batch_idx", pa.array([i] * t.num_rows, pa.int64()))
            out.append(t)
        return pa.concat_tables(out)

    idx = rd.from_arrow(pa.table({"batch_idx": pa.array(range(n_batches))}))
    return idx.map_batches(load, batch_format="pyarrow", batch_size=1)
