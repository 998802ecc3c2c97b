"""Process-local allocator tuning.

This sandbox's kernel has very expensive first-touch page faults
(~30 MB/s for freshly mmap'd pages vs ~6 GB/s warm).  By default glibc
serves >128 KB allocations via mmap and unmaps them on free, so every
large numpy temporary pays the fault cost again.  Raising
M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps big blocks on the sbrk heap,
where freed chunks are reused warm — measured ~20x speedup on the
steady-state encode kernels.  Called at package import, so every Ray
worker that imports packcol is tuned; harmless anywhere else.
"""

from __future__ import annotations

_DONE = False


def tune_malloc() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform — nothing to tune
    try:
        # Arrow's bundled jemalloc/mimalloc returns pages to the OS on
        # free (madvise), re-paying the fault cost on every parquet read.
        # The system (glibc) pool + the mallopt above keeps Arrow buffers
        # on the warm heap too.
        import pyarrow as pa
        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
