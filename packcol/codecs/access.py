"""Point access into encoded blocks without full decode.

The reference's packed buffer supports O(1) random reads of any value
(`SeqVector::get_kmer_u64` / `Kmer::get`,
/root/reference/src/naive_impl/seq_vector.rs:96-103,
/root/reference/src/kmer.rs:46-53).  The generalization: read row `i` of
an EncodedColumn touching only O(1) (bit-pack, FOR, dict) or O(runs)
(RLE, binary-searched) of the payload — used by decode-verify sampling
so spot checks never decode whole blocks.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from .base import EncodedColumn, str_to_type, validity_from_bytes
from .dictionary import ipc_deserialize_array


def _unpack_one(payload: bytes, width: int, i: int) -> int:
    """Extract the i-th width-bit value from a packed little-endian
    bitstream, touching at most 16 bytes."""
    if width == 0:
        return 0
    bit = i * width
    byte0 = bit // 8
    nbytes = (bit % 8 + width + 7) // 8
    chunk = payload[byte0:byte0 + nbytes]
    acc = int.from_bytes(chunk, "little")
    return (acc >> (bit % 8)) & ((1 << width) - 1)


def get_value(enc: EncodedColumn, i: int):
    """Row i of an encoded column, as a Python value (None for nulls)."""
    if not (0 <= i < enc.n_values):
        raise IndexError(i)
    valid = validity_from_bytes(enc.buffers.get("validity", b""),
                                enc.n_values)
    if valid is not None and not valid[i]:
        return None
    p = enc.params
    if enc.codec == "dict":
        code = _unpack_one(enc.buffers["payload"], p["width"], i)
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        return dictionary[code].as_py()
    if enc.codec in ("for", "bitpack"):
        delta = _unpack_one(enc.buffers["payload"], p["width"], i)
        # mod-2^64 add in a uint64 array, then reinterpret — wrapping
        # via scalar np.int64(np.uint64(...)) raises on numpy >= 2.0
        u = np.array([p["base"]], dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            u = u + np.uint64(delta)
        v64 = u.view(np.int64)
        from .forpack import from_int64_numpy
        return from_int64_numpy(v64, str_to_type(p["dtype"]))[0].as_py()
    if enc.codec == "rle":
        # vectorized unpack of the run lengths (one pass over the small
        # lens buffer), then binary search the cumulative lengths
        from .bitpack import unpack
        nr = p["n_runs"]
        words = np.frombuffer(enc.buffers["lens"], dtype=np.uint64)
        lens = unpack(words, p["len_width"], nr).astype(np.int64)
        ends = np.cumsum(lens)
        run = int(np.searchsorted(ends, i, side="right"))
        code = _unpack_one(enc.buffers["payload"], p["val_width"], run) - 1
        if code < 0:
            return None
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        return dictionary[code].as_py()
    # fsst / store: no sub-linear path — decode the block (documented)
    from .base import decode_any
    return decode_any(enc)[i].as_py()


# ---------------------------------------------------------------------------
# encoded-domain predicates: evaluate filters on packed codes without
# materializing values — the classic lightweight-compression payoff.
# Order-preserving dictionaries (H3) make range predicates a code-range
# comparison; FOR/delta make them integer bounds on deltas.
# ---------------------------------------------------------------------------

def _dict_codes(enc: EncodedColumn) -> np.ndarray:
    from .bitpack import unpack
    words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
    return unpack(words, enc.params["width"], enc.n_values)


def _predicate_int(value, dtype_str: str | None) -> int:
    """Physical int64 of a predicate scalar for for/bitpack comparison —
    accepts plain ints or logical values (datetime, date, bool) of the
    column's dtype."""
    if isinstance(value, (int, np.integer)):
        return int(value)
    from .forpack import to_int64_numpy
    t = str_to_type(dtype_str) if dtype_str else None
    try:
        return int(to_int64_numpy(pa.array([value], type=t))[0])
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
        raise TypeError(
            f"predicate value {value!r} ({type(value).__name__}) is not "
            f"comparable with this column's logical type "
            f"{dtype_str or 'int64'}; pass a value of that type") from e


def filter_eq(enc: EncodedColumn, value) -> np.ndarray:
    """Boolean mask of rows equal to `value`, computed on codes (dict)
    or deltas (for) — never decodes the column."""
    valid = validity_from_bytes(enc.buffers.get("validity", b""),
                                enc.n_values)
    if enc.codec == "dict":
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        # sorted dictionary → binary search for the code
        import pyarrow.compute as pc
        idx = pc.index_in(pa.array([value], type=dictionary.type),
                          value_set=dictionary)[0].as_py()
        if idx is None:
            return np.zeros(enc.n_values, dtype=bool)
        mask = _dict_codes(enc) == np.uint64(idx)
    elif enc.codec in ("for", "bitpack") and \
            enc.params.get("dtype") != "uint64":
        # (uint64 is stored as a mod-2^64 reinterpret whose int64 order
        # differs from value order — decode fallback below stays exact)
        p = enc.params
        from .bitpack import unpack
        base = int(p["base"])
        target = _predicate_int(value, p.get("dtype")) - base
        if target < 0 or (p["width"] < 64 and target >= (1 << p["width"])):
            return np.zeros(enc.n_values, dtype=bool)
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        mask = unpack(words, p["width"], enc.n_values) == np.uint64(target)
    else:
        from .base import decode_any
        import pyarrow.compute as pc
        return pc.equal(decode_any(enc), value).fill_null(False) \
            .to_numpy(zero_copy_only=False)
    if valid is not None:
        mask &= valid
    return mask


def filter_in(enc: EncodedColumn, values) -> np.ndarray:
    """Mask of rows whose value is in `values` (an IN-list), computed on
    codes / deltas like filter_eq — one np.isin over the packed stream
    instead of len(values) eq passes."""
    valid = validity_from_bytes(enc.buffers.get("validity", b""),
                                enc.n_values)
    import pyarrow.compute as pc
    if enc.codec == "dict":
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        idx = pc.index_in(pa.array(list(values), type=dictionary.type),
                          value_set=dictionary)
        codes = np.array([i for i in idx.to_pylist() if i is not None],
                         dtype=np.uint64)
        if len(codes) == 0:
            return np.zeros(enc.n_values, dtype=bool)
        mask = np.isin(_dict_codes(enc), codes)
    elif enc.codec in ("for", "bitpack") and \
            enc.params.get("dtype") != "uint64":
        p = enc.params
        from .bitpack import unpack
        base = int(p["base"])
        cap = (1 << p["width"]) - 1 if p["width"] < 64 else (1 << 64) - 1
        targets = []
        for v in values:
            t = _predicate_int(v, p.get("dtype")) - base
            if 0 <= t <= cap:
                targets.append(t)
        if not targets:
            return np.zeros(enc.n_values, dtype=bool)
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        mask = np.isin(unpack(words, p["width"], enc.n_values),
                       np.array(targets, dtype=np.uint64))
    else:
        from .base import decode_any
        arr = decode_any(enc)
        return pc.is_in(arr, value_set=pa.array(list(values),
                                                type=arr.type)) \
            .fill_null(False).to_numpy(zero_copy_only=False)
    if valid is not None:
        mask &= valid
    return mask


def filter_range(enc: EncodedColumn, lo, hi) -> np.ndarray:
    """Mask of lo <= value <= hi computed in the ENCODED domain:

    * dict — codes are order-preserving (sorted dictionary, the
      LexHasher property H3), so the range becomes a code interval;
    * for / bitpack — the range becomes integer bounds on the packed
      deltas (no value reconstruction);
    * anything else — decode fallback (still correct, not pushed)."""
    valid = validity_from_bytes(enc.buffers.get("validity", b""),
                                enc.n_values)
    if enc.codec == "dict":
        dictionary = ipc_deserialize_array(enc.buffers["aux"])
        dvals = dictionary.to_pylist()
        import bisect
        lo_code = bisect.bisect_left(dvals, lo)
        hi_code = bisect.bisect_right(dvals, hi) - 1
        if hi_code < lo_code:
            return np.zeros(enc.n_values, dtype=bool)
        codes = _dict_codes(enc)
        mask = (codes >= np.uint64(lo_code)) & (codes <= np.uint64(hi_code))
    elif enc.codec in ("for", "bitpack") and \
            enc.params.get("dtype") != "uint64":
        from .bitpack import unpack
        p = enc.params
        base = int(p["base"])
        cap = (1 << p["width"]) - 1 if p["width"] < 64 else (1 << 64) - 1
        lo_t = max(_predicate_int(lo, p.get("dtype")) - base, 0)
        hi_t = min(_predicate_int(hi, p.get("dtype")) - base, cap)
        if hi_t < lo_t:
            return np.zeros(enc.n_values, dtype=bool)
        words = np.frombuffer(enc.buffers["payload"], dtype=np.uint64)
        deltas = unpack(words, p["width"], enc.n_values)
        mask = (deltas >= np.uint64(lo_t)) & (deltas <= np.uint64(hi_t))
    else:
        import pyarrow.compute as pc
        from .base import decode_any
        arr = decode_any(enc)
        mask = pc.and_(pc.greater_equal(arr, lo),
                       pc.less_equal(arr, hi)).fill_null(False) \
            .to_numpy(zero_copy_only=False)
        return mask
    if valid is not None:
        mask &= valid
    return mask
