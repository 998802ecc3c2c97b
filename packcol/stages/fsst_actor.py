"""Stateful FSST encoder actor pool.

The per-block FSST codec (codecs/fsst.py) rebuilds its symbol table for
every block — self-describing, but at 100 TB the table-build sampling
cost repeats per block and tables differ across blocks (hurting
downstream compaction).  This stage is the actor-pool alternative the
north star names: a callable CLASS for ``map_batches(..., concurrency=N)``
whose ``__init__`` builds ONE symbol table per actor from a sample
(generalizing the reference's sample-don't-scan minimizer idea,
/root/reference/src/naive_impl/seq_vector/minimizers.rs:38-142), and
whose ``__call__`` reuses it for every batch.

The shared table must remain valid for unseen data: code bytes are
chosen from bytes unused in the SAMPLE, so a later batch may contain a
code byte.  Those rows fall back to the per-block codec (exact, still
self-describing) — the header records which path was used.

Usage:
    enc = ds.map_batches(
        FsstEncodeActor(sample_paths=paths, columns=["text", "html"]),
        batch_format="pyarrow", concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs.base import EncodedColumn, validity_to_bytes
from ..codecs.bitpack import bits_needed, pack
from ..codecs.fsst import (FsstCodec, build_symbol_table, buffer_view,
                           fsst_compress)
from ..stages.encode import ENC_SCHEMA


def build_shared_table(sample_paths: list[str], columns: list[str],
                       sample_rows_per_file: int = 2000,
                       max_files: int = 4) -> dict:
    """Symbol tables per column from a bounded sample of the input files.
    Pure function of (paths, params) → deterministic for resume."""
    import pyarrow.parquet as pq
    tables: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    bufs: dict[str, list[np.ndarray]] = {c: [] for c in columns}
    for p in sorted(sample_paths)[:max_files]:
        t = pq.ParquetFile(p)
        head = next(t.iter_batches(batch_size=sample_rows_per_file,
                                   columns=columns), None)
        if head is None:  # empty sample file: skip, don't kill the pool
            continue
        tt = pa.Table.from_batches([head])
        for c in columns:
            col = tt.column(c).combine_chunks()
            if col.null_count:
                fill = (b"" if pa.types.is_binary(col.type) or
                        pa.types.is_large_binary(col.type) else "")
                col = pc.fill_null(col, fill)
            d, _ = buffer_view(col)
            bufs[c].append(d)
    for c in columns:
        d = np.concatenate(bufs[c]) if bufs[c] else np.empty(0, np.uint8)
        tables[c] = build_symbol_table(d)
    return tables


class FsstEncodeActor:
    """Actor-pool map_batches callable: encodes the given string columns
    with a shared per-actor symbol table (built once in __init__)."""

    def __init__(self, sample_paths: list[str], columns: list[str],
                 sample_rows_per_file: int = 2000):
        # one-time per actor: the stateful setup the actor pool amortizes
        self.columns = columns
        self.tables = build_shared_table(
            sample_paths, columns, sample_rows_per_file)
        self._fallback = FsstCodec()

    def encode_column(self, col: pa.Array, name: str) -> EncodedColumn:
        from ..codecs.base import type_to_str
        code_bytes, digrams = self.tables[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        validity = validity_to_bytes(col)
        filled = col
        if col.null_count:
            fill = (b"" if pa.types.is_binary(col.type) or
                    pa.types.is_large_binary(col.type) else "")
            filled = pc.fill_null(col, fill)
        d, offs = buffer_view(filled)
        # shared table valid only if no data byte collides with a code byte
        if len(code_bytes) and len(d) and \
                np.isin(code_bytes, np.flatnonzero(
                    np.bincount(d, minlength=256))).any():
            return self._fallback.encode(col)  # exact per-block fallback
        out, enc_offs = fsst_compress(d, offs, code_bytes, digrams)
        lens = np.diff(enc_offs)
        lw = bits_needed(int(lens.max()) if len(lens) else 0)
        return EncodedColumn(
            codec="fsst", n_values=len(col),
            params={"codes": code_bytes.tolist(),
                    "digrams": digrams.tolist(), "len_width": lw,
                    "dtype": type_to_str(col.type), "shared_table": True},
            buffers={"payload": out.tobytes(),
                     "lens": pack(lens.view(np.uint64), lw).tobytes(),
                     "validity": validity})

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.encode import content_part_id
        part_id = content_part_id(batch)
        rows = {name: [] for name in ENC_SCHEMA.names}
        for name in self.columns:
            col = batch.column(name)
            enc = self.encode_column(col, name)
            r = enc.to_row()
            rows["part_id"].append(part_id)
            rows["column"].append(name)
            rows["codec"].append(r["codec"])
            rows["n_values"].append(r["n_values"])
            rows["params"].append(r["params"])
            rows["payload"].append(r["payload"])
            rows["orig_bytes"].append(
                col.nbytes if not isinstance(col, pa.ChunkedArray)
                else col.combine_chunks().nbytes)
            rows["enc_bytes"].append(enc.enc_bytes)
        rows["n_cols"] = [len(self.columns)] * len(rows["part_id"])
        return pa.table(rows, schema=ENC_SCHEMA)
