"""Regression tests for the round-1 ADVICE findings.

1. content_part_id must distinguish blocks that differ only in middle
   rows (was: silent data loss via part-id collision + dict overwrite).
2. encode_with_guard must survive a sampled-stat false positive for ANY
   codec (was: decfloat re-selected after its own ValueError → crash).
3. dataset/batch content hash must be row-alignment-sensitive (was:
   commutative across (column, value) cells).
"""

import numpy as np
import pyarrow as pa
import pytest

from packcol.pipelines.content_hash import batch_row_hashes
from packcol.stages.encode import (DecodeBatch, content_part_id,
                                   decode_rows, encode_table)
from packcol.stages.select import encode_with_guard


def test_part_id_differs_on_middle_row_change():
    a = pa.table({"x": ["first", "MIDDLE-A", "last"]})
    b = pa.table({"x": ["first", "MIDDLE-B", "last"]})
    assert content_part_id(a) != content_part_id(b)


def test_encode_decode_two_near_identical_blocks_no_loss():
    """Two blocks equal except the middle row must decode to 6 rows."""
    a = pa.table({"x": ["first", "MIDDLE-A", "last"]})
    b = pa.table({"x": ["first", "MIDDLE-B", "last"]})
    enc = pa.concat_tables([encode_table(a), encode_table(b)])
    out = DecodeBatch()(enc)
    assert out.num_rows == 6
    assert sorted(out.column("x").to_pylist()) == sorted(
        a.column("x").to_pylist() + b.column("x").to_pylist())


def test_decode_rows_raises_on_duplicate_column():
    a = pa.table({"x": ["first", "MIDDLE-A", "last"]})
    enc = pa.concat_tables([encode_table(a, part_id="p"),
                            encode_table(a, part_id="p")])
    with pytest.raises(ValueError, match="duplicate encoded row"):
        decode_rows(enc)


def test_guard_survives_decfloat_sample_false_positive():
    """Strided sample is exact 2-decimal but the full column is not:
    the guard must fall back (and roundtrip) instead of crashing."""
    v = np.round(np.linspace(1.0, 99.0, 10_000), 2)
    v[5001] = 0.123456789  # off-sample full-precision value
    arr = pa.array(v, type=pa.float64())
    enc = encode_with_guard(arr)
    assert enc.codec != "decfloat"
    from packcol.codecs import decode_any
    assert decode_any(enc).equals(arr)


def test_row_hash_sensitive_to_alignment():
    a = pa.table({"k": [1, 2], "v": ["a", "b"]})
    b = pa.table({"k": [1, 2], "v": ["b", "a"]})  # same cell multisets
    ha = np.sort(batch_row_hashes(a))
    hb = np.sort(batch_row_hashes(b))
    assert not np.array_equal(ha, hb)
    # but permuting whole rows leaves the multiset of row hashes equal
    c = pa.table({"k": [2, 1], "v": ["b", "a"]})
    hc = np.sort(batch_row_hashes(c))
    assert np.array_equal(ha, hc)
