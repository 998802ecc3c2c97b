"""Dictionary codec: value→code table + bit-packed codes.

Generalizes the reference's 24-permutation symbol→code tables
(/root/reference/src/encoding/naive.rs:49-74) to arbitrary-cardinality,
per-block dictionaries.  Codes are **order-preserving** (the dictionary
is sorted, so comparing codes == comparing values), generalizing the
order-preserving LexHasher (/root/reference/src/naive_impl/hash.rs:22-72).
Code width = ⌈log2(cardinality)⌉ bits (kmer_space math,
/root/reference/src/utils.rs:27-38): a 4-value column packs to exactly
2 bits/value like the reference k-mers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import (Codec, EncodedColumn, apply_validity, register,
                   str_to_type, type_to_str, validity_from_bytes,
                   validity_to_bytes)
from .bitpack import bits_needed, pack, unpack


def ipc_serialize_array(arr: pa.Array) -> bytes:
    t = pa.table({"v": arr})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def ipc_deserialize_array(b: bytes) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(b)) as r:
        t = r.read_all()
    return t.column("v").combine_chunks()


def dict_encode_indices(arr: pa.Array, sort_dictionary: bool = True):
    """(codes:int64 np array with nulls→0, dictionary:pa.Array).

    With sort_dictionary=True codes are order-preserving (sorted dict).
    """
    denc = pc.dictionary_encode(arr)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dictionary = denc.dictionary
    indices = denc.indices
    idx = indices.to_numpy(zero_copy_only=False)
    idx = np.asarray(idx)
    if indices.null_count:
        idx = np.nan_to_num(idx, nan=0.0)
    idx = idx.astype(np.int64)
    if sort_dictionary and len(dictionary) > 1:
        order = pc.array_sort_indices(dictionary).to_numpy(zero_copy_only=False)
        order = order.astype(np.int64)
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order), dtype=np.int64)
        idx = rank[idx]
        dictionary = dictionary.take(pa.array(order))
    return idx, dictionary


class DictionaryCodec(Codec):
    name = "dict"

    def can_encode(self, dtype: pa.DataType, stats: dict | None = None) -> bool:
        return not (pa.types.is_nested(dtype) or pa.types.is_null(dtype))

    def encode(self, arr: pa.Array) -> EncodedColumn:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        validity = validity_to_bytes(arr)
        idx, dictionary = dict_encode_indices(arr)
        width = bits_needed(max(len(dictionary) - 1, 0))
        payload = pack(idx.view(np.uint64), width)
        return EncodedColumn(
            codec=self.name,
            n_values=len(arr),
            params={"width": width, "dtype": type_to_str(arr.type),
                    "n_dict": len(dictionary)},
            buffers={"payload": payload.tobytes(),
                     "aux": ipc_serialize_array(dictionary),
                     "validity": validity},
        )

    def decode(self, enc: EncodedColumn) -> pa.Array:
        n = enc.n_values
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        if len(dictionary) == 0:  # all-null column
            return pa.nulls(n, type=str_to_type(enc.params["dtype"]))
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        idx = unpack(words, enc.params["width"], n).view(np.int64)
        out = dictionary.take(pa.array(idx))
        out = out.cast(str_to_type(enc.params["dtype"]))
        valid = validity_from_bytes(enc.buffers.get("validity", b""), n)
        return apply_validity(out, valid)


register(DictionaryCodec())
