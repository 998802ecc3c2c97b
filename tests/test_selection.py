"""Codec auto-selection edge cases (FIXTURES.md F3 `stats_edge`)."""

import numpy as np
import pyarrow as pa

from packcol.stages.encode import decode_rows, encode_table
from packcol.stages.select import choose_codec, encode_with_guard
from packcol.stages.stats import column_stats

RNG = np.random.default_rng(42)
N = 4000


def build_stats_edge() -> pa.Table:
    base = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
    sorted_ts = base + np.cumsum(RNG.integers(1, 1000, N))
    shared = "https://cdn.example.com/assets/"
    return pa.table({
        "const_col": pa.array(["same"] * N),
        "lowcard_col": pa.array(RNG.choice(list("ACGT"), N).tolist()),
        "runs_col": pa.array(np.repeat([f"v{i % 8}" for i in range(40)],
                                       N // 40).tolist()),
        "sorted_ts": pa.array(sorted_ts, type=pa.int64()).cast(
            pa.timestamp("us")),
        "uniq_str": pa.array([f"{shared}{RNG.bytes(8).hex()}-{i}"
                              for i in range(N)]),
        "rand_bytes": pa.array([RNG.bytes(64) for _ in range(N)],
                               type=pa.large_binary()),
        "empty_nulls": pa.array([("" if i % 3 == 0 else None) if i % 2 == 0
                                 else f"s{i % 5}" for i in range(N)]),
    })


def test_expected_codecs():
    t = build_stats_edge()
    enc = encode_table(t)
    chosen = dict(zip(enc.column("column").to_pylist(),
                      enc.column("codec").to_pylist()))
    assert chosen["const_col"] == "rle"
    assert chosen["lowcard_col"] == "dict"
    assert chosen["runs_col"] == "rle"
    assert chosen["sorted_ts"] in ("for", "delta")
    assert chosen["uniq_str"] == "fsst"
    # incompressible: size guard must prevent expansion beyond store
    assert chosen["rand_bytes"] in ("store", "fsst")
    sizes = dict(zip(enc.column("column").to_pylist(),
                     zip(enc.column("orig_bytes").to_pylist(),
                         enc.column("enc_bytes").to_pylist())))
    orig, encb = sizes["rand_bytes"]
    assert encb <= orig * 1.05 + 256


def test_lowcard_two_bit_packing():
    """4-value column → 2 bits/value (the kmers parity bound)."""
    t = build_stats_edge()
    enc = encode_table(t, codec_overrides={"lowcard_col": "dict"})
    i = enc.column("column").to_pylist().index("lowcard_col")
    import json
    params = json.loads(enc.column("params")[i].as_py())
    assert params["width"] == 2


def test_roundtrip_all_edge_columns():
    t = build_stats_edge()
    dec = decode_rows(encode_table(t))
    for name in t.column_names:
        assert dec.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()), name


def test_decision_deterministic():
    t = build_stats_edge()
    for name in t.column_names:
        col = t.column(name).combine_chunks()
        s1, s2 = column_stats(col), column_stats(col)
        assert choose_codec(col.type, s1) == choose_codec(col.type, s2)


def test_size_guard_fallback():
    """A codec that expands must fall back to store."""
    arr = pa.array([RNG.bytes(100) for _ in range(200)],
                   type=pa.large_binary())
    enc = encode_with_guard(arr, codec_name="rle")  # rle on all-distinct
    assert enc.codec == "store"
