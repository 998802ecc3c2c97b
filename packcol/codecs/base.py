"""Codec contract + encoded-column container.

The contract generalizes the reference's ``Encoding`` trait
(/root/reference/src/encoding/mod.rs:14-23): ``decode(encode(col)) == col``
bit-identical, including nulls.  An :class:`EncodedColumn` is
self-describing — everything needed to decode (codec name, params,
auxiliary buffers such as dictionaries / symbol tables, validity bitmap)
travels inside it, mirroring ``SeqVector``'s self-contained serde form
(/root/reference/src/naive_impl/seq_vector.rs:18-22).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# Arrow type <-> string (params are JSON; the type must round-trip exactly)
# ---------------------------------------------------------------------------

_SIMPLE_TYPES = {
    "bool": pa.bool_(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
    "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "double": pa.float64(),
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "date32[day]": pa.date32(), "date64[ms]": pa.date64(),
}


def type_to_str(t: pa.DataType) -> str:
    return str(t)


def str_to_type(s: str) -> pa.DataType:
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    if s.startswith("timestamp["):
        inner = s[len("timestamp["):-1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    if s.startswith("time32["):
        return pa.time32(s[len("time32["):-1])
    if s.startswith("time64["):
        return pa.time64(s[len("time64["):-1])
    if s.startswith("duration["):
        return pa.duration(s[len("duration["):-1])
    if s.startswith("decimal128("):
        prec, scale = s[len("decimal128("):-1].split(",")
        return pa.decimal128(int(prec), int(scale))
    raise ValueError(f"unsupported arrow type string: {s!r}")


# ---------------------------------------------------------------------------
# EncodedColumn
# ---------------------------------------------------------------------------

@dataclass
class EncodedColumn:
    """Self-describing encoded column block.

    buffers: named binary buffers — by convention ``payload`` (packed words,
    analogous to SeqVector's u64 backing), ``aux`` (Arrow-IPC dictionary /
    symbol table), ``offsets`` (packed string offsets), ``validity``
    (LSB-first packed null bitmap, empty when no nulls).
    """

    codec: str
    n_values: int
    params: dict = field(default_factory=dict)
    buffers: dict = field(default_factory=dict)   # str -> bytes
    # runtime-only (never serialized): directory for resolving shared
    # sidecar refs (params["shared_ref"]) written next to encoded parts
    base_dir: str | None = None

    @property
    def enc_bytes(self) -> int:
        return sum(len(b) for b in self.buffers.values()) + len(
            json.dumps(self.params, separators=(",", ":"))
        )

    # -- flat (Arrow-row) form: buffers packed into one large_binary --------
    def to_row(self) -> dict:
        names = sorted(self.buffers)
        blob = b"".join(self.buffers[n] for n in names)
        sizes = {n: len(self.buffers[n]) for n in names}
        return {
            "codec": self.codec,
            "n_values": self.n_values,
            "params": json.dumps({"_buf_sizes": sizes, **self.params},
                                 separators=(",", ":")),
            "payload": blob,
        }

    @classmethod
    def from_row(cls, row: dict) -> "EncodedColumn":
        params = json.loads(row["params"])
        sizes = params.pop("_buf_sizes")
        blob = row["payload"]
        buffers, pos = {}, 0
        for n in sorted(sizes):
            buffers[n] = bytes(blob[pos:pos + sizes[n]])
            pos += sizes[n]
        return cls(codec=row["codec"], n_values=int(row["n_values"]),
                   params=params, buffers=buffers)


# ---------------------------------------------------------------------------
# validity (null bitmap) helpers — LSB-first packed bits
# ---------------------------------------------------------------------------

def validity_to_bytes(arr: pa.Array) -> bytes:
    """Packed is_valid bitmap; empty bytes when the array has no nulls."""
    if arr.null_count == 0:
        return b""
    valid = arr.is_valid().to_numpy(zero_copy_only=False).astype(np.uint8)
    return np.packbits(valid, bitorder="little").tobytes()


def validity_from_bytes(b: bytes, n: int) -> np.ndarray | None:
    """Boolean is_valid array of length n, or None when no nulls recorded."""
    if not b:
        return None
    bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8), bitorder="little")
    return bits[:n].astype(bool)


def apply_validity(arr: pa.Array, valid: np.ndarray | None) -> pa.Array:
    """Re-attach a null bitmap to a fully-valid decoded array."""
    if valid is None:
        return arr
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
        return pa.array(arr.to_numpy(zero_copy_only=False), type=arr.type,
                        mask=~valid)
    # generic: replace invalid slots with null via if_else
    import pyarrow.compute as pc
    nulls = pa.nulls(len(arr), type=arr.type)
    return pc.if_else(pa.array(valid), arr, nulls)


# ---------------------------------------------------------------------------
# Codec ABC + registry
# ---------------------------------------------------------------------------

class Codec:
    """Lossless per-column codec (contract = reference Encoding trait E1)."""

    name: str = "base"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        raise NotImplementedError

    def encode(self, arr: pa.Array) -> EncodedColumn:
        raise NotImplementedError

    def decode(self, enc: EncodedColumn) -> pa.Array:
        raise NotImplementedError


_REGISTRY: dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.name] = codec
    return codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def all_codecs() -> dict[str, Codec]:
    return dict(_REGISTRY)


def decode_any(enc: EncodedColumn) -> pa.Array:
    return get_codec(enc.codec).decode(enc)
