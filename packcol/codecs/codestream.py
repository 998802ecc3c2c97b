"""Code-stream packing shared by the token codecs.

Given int64 codes over a dictionary of size ``nd`` (frequency-ordered —
hot codes small), pick the smaller of two exact layouts:

* ``flat`` — ⌈log2(nd)⌉-bit packed words (:mod:`.bitpack`);
* ``esc``  — escape-byte stream: codes < 255 as single bytes, the rest
  as 0xFF plus a bit-packed side stream of ``code-255`` (code 255
  itself rides the side stream as value 0).

The choice is a pure function of the codes, so re-encoding a partition
reproduces identical bytes (resume contract).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bits_needed, pack, unpack


def encode_code_stream(idx: np.ndarray, nd: int) -> tuple[dict, dict]:
    """(params, buffers) for the smaller layout of ``idx`` codes."""
    ntok = len(idx)
    cw = bits_needed(max(nd - 1, 0))
    flat_bytes = -(-(ntok * cw) // 64) * 8
    n_rare = int((idx >= 255).sum()) if (ntok and nd > 255) else 0
    sw = bits_needed(max(nd - 256, 0))
    esc_bytes = ntok + -(-(n_rare * sw) // 64) * 8
    if nd > 255 and esc_bytes < flat_bytes:
        rare = idx >= 255
        return ({"scheme": "esc", "code_width": cw, "n_rare": n_rare,
                 "side_width": sw},
                {"payload": np.minimum(idx, 255).astype(np.uint8)
                 .tobytes(),
                 "side": pack((idx[rare] - 255).astype(np.uint64),
                              sw).tobytes()})
    return ({"scheme": "flat", "code_width": cw},
            {"payload": pack(idx.view(np.uint64), cw).tobytes()})


def decode_code_stream(p: dict, buffers: dict, nt: int) -> np.ndarray:
    """Inverse of :func:`encode_code_stream` → int64 codes."""
    if p.get("scheme") == "esc":
        b = np.frombuffer(buffers["payload"], dtype=np.uint8)[:nt]
        idx = b.astype(np.int64)
        if p["n_rare"]:
            side = unpack(np.frombuffer(buffers["side"], dtype=np.uint64),
                          p["side_width"], p["n_rare"]).view(np.int64)
            idx[b == 255] = side + 255
        return idx
    return unpack(np.frombuffer(buffers["payload"], dtype=np.uint64),
                  p["code_width"], nt).view(np.int64)
