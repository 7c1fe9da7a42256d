"""gdal_ray: Ray-Data-native spatial-join + tiling engine.

Allocator tuning: glibc malloc serves large numpy temporaries via mmap and
returns them to the OS on free, so every vectorized op re-faults its pages.
On this sandbox's kernel, faulting fresh pages is ~1000x slower than reusing
warm ones, which dominates all wall time.  Raising M_MMAP_THRESHOLD keeps
large blocks on the heap free-lists so steady-state batches run at full
speed.  Runs at import time so both the driver process and every Ray worker
(which imports this package when deserializing stage callables) get it.
"""

from __future__ import annotations

import os


def _tune_allocator() -> None:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform: env var fallback above still helps children


_tune_allocator()
