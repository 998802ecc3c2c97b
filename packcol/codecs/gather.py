"""Chunked byte-gather kernel shared by the token codecs.

``concat_gather(dd, starts, lens)`` materializes the concatenation of
``dd[starts[i] : starts[i]+lens[i]]`` for every i — the inner loop of
dictionary-style string decode.  Works in ~2 MB output slices with
int32 index temporaries, so per-task scratch stays cache-resident (and
fault-wall-cheap) instead of O(part bytes) of fresh int64 arrays.
"""

from __future__ import annotations

import numpy as np

_CHUNK_ITEMS = 1 << 18


def concat_gather(dd: np.ndarray, starts: np.ndarray,
                  lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(out_bytes, out_offsets[int64]) for the concatenated gather."""
    n = len(starts)
    cs = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum(lens, out=cs[1:])
    total = int(cs[-1])
    out = np.empty(total, dtype=np.uint8)
    use32 = len(dd) < (1 << 31) and total < (1 << 31)
    idt = np.int32 if use32 else np.int64
    for a in range(0, n, _CHUNK_ITEMS):
        b = min(a + _CHUNK_ITEMS, n)
        lo, hi = int(cs[a]), int(cs[b])
        span = hi - lo
        if span == 0:
            continue
        ln = lens[a:b].astype(idt, copy=False)
        rel = np.arange(span, dtype=idt)
        rel -= np.repeat((cs[a:b] - lo).astype(idt, copy=False), ln)
        src = np.repeat(starts[a:b].astype(idt, copy=False), ln)
        src += rel
        out[lo:hi] = dd[src]
    return out, cs
