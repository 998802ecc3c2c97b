"""Byte-gather kernels shared by the token codecs.

``take_concat(dictionary, idx)`` materializes the concatenation of
``dictionary[idx[i]]`` for every i — the inner loop of
dictionary-style string decode — via Arrow's C++ ``take`` kernel: the
take result's data buffer IS the concatenated bytes and its offsets
buffer IS the cumulative-length array, both zero-copy views.  ~30x
faster than the numpy repeat+fancy-index formulation on zipf-coded
token streams (measured round 4), because the index temporaries there
cost 4-8 bytes per OUTPUT byte while Arrow gathers with one memcpy per
entry.

``concat_gather(dd, starts, lens)`` is the generic form for arbitrary
(start, len) slices of a flat byte buffer (used where the slices are
not entries of an Arrow array, e.g. webtext html→text extraction).
Works in ~2 MB output slices with int32 index temporaries, so per-task
scratch stays cache-resident (and fault-wall-cheap) instead of
O(part bytes) of fresh int64 arrays.
"""

from __future__ import annotations

import numpy as np

_CHUNK_ITEMS = 1 << 18


def take_concat(dictionary, idx: np.ndarray) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """(out_bytes, out_offsets[int64]) for concat(dictionary[idx]).

    ``dictionary`` is a string-ish pa.Array; ``idx`` int64 codes.  The
    returned arrays are zero-copy views of the Arrow take result (the
    numpy views keep the backing pa.Buffers alive)."""
    import pyarrow as pa
    nt = len(idx)
    if nt == 0 or len(dictionary) == 0:
        return np.empty(0, np.uint8), np.zeros(nt + 1, np.int64)
    lb = dictionary.cast(pa.large_binary())
    t = lb.take(pa.array(idx, type=pa.int64()))
    offs = np.frombuffer(t.buffers()[1], dtype=np.int64)[
        t.offset: t.offset + nt + 1]
    buf = t.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            and len(buf) else np.empty(0, np.uint8))
    if offs[0]:
        return data[offs[0]:offs[-1]], offs - offs[0]
    return data[:offs[-1]], offs


def concat_gather(dd: np.ndarray, starts: np.ndarray,
                  lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(out_bytes, out_offsets[int64]) for the concatenated gather."""
    n = len(starts)
    cs = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum(lens, out=cs[1:])
    total = int(cs[-1])
    out = np.empty(total, dtype=np.uint8)
    if n and total // n >= 128:
        # long-slice fast path: one memcpy per slice beats building
        # 4-8 index bytes per OUTPUT byte (35x on ~KB slices, round 4);
        # per-iteration Python overhead is amortized over >=128 B
        for i in range(n):
            s = starts[i]
            out[cs[i]:cs[i + 1]] = dd[s:s + lens[i]]
        return out, cs
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
