"""Driver-style correctness sweep: run __ray_entry__.queries() against
__ray_entry__.oracle_sql() in DuckDB over the same parquet dir.

Usage:
    python scripts/correctness_check.py [--sf DIR] [query ...]

Compares per query: row count, sorted column-name schema, and an
order-insensitive value hash (columns sorted by name, rows sorted).
Queries without an oracle entry are reported rows-only.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd


def _to_pandas(res):
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon_pair(a: pd.DataFrame, b: pd.DataFrame):
    """Canonicalize two frames jointly: same column order, numeric
    dtypes reconciled only where the sides disagree (int vs float /
    numeric-object), datetimes to us."""
    a = a[sorted(a.columns)].copy()
    b = b[sorted(b.columns)].copy()

    def kind(s):
        if pd.api.types.is_datetime64_any_dtype(s):
            return "dt"
        if pd.api.types.is_float_dtype(s):
            return "f"
        if pd.api.types.is_integer_dtype(s):
            return "i"
        if s.dtype == object:
            try:
                pd.to_numeric(s, errors="raise")
                return "on"  # numeric-valued object (ints + None)
            except (ValueError, TypeError):
                return "o"
        return "o"

    for c in a.columns:
        if c not in b.columns:
            continue
        ka, kb = kind(a[c]), kind(b[c])
        if ka == kb == "dt":
            a[c] = a[c].astype("datetime64[us]")
            b[c] = b[c].astype("datetime64[us]")
        elif {ka, kb} <= {"f", "i", "on"} and (ka != kb or "f" in (ka, kb)):
            a[c] = pd.to_numeric(a[c]).astype("float64").round(6)
            b[c] = pd.to_numeric(b[c]).astype("float64").round(6)
        elif ka == "o" or kb == "o":
            a[c] = a[c].astype(str)
            b[c] = b[c].astype(str)

    def finish(df):
        return df.sort_values(list(df.columns), kind="stable") \
                 .reset_index(drop=True)
    return finish(a), finish(b)


def _dtype_mismatches(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Columns whose numeric KIND differs between engine and oracle
    (int64 vs float64 etc).  The driver's row hash is dtype-sensitive —
    DuckDB HUGEINT→float64 vs engine int64 fails there even when the
    values are equal — so the local sweep must flag it too."""
    out = []
    for c in a.columns:
        if c not in b.columns:
            continue
        ka = ("f" if pd.api.types.is_float_dtype(a[c]) else
              "i" if pd.api.types.is_integer_dtype(a[c]) else None)
        kb = ("f" if pd.api.types.is_float_dtype(b[c]) else
              "i" if pd.api.types.is_integer_dtype(b[c]) else None)
        if ka is not None and kb is not None and ka != kb:
            out.append(f"{c}: engine={a[c].dtype} oracle={b[c].dtype}")
    return out


def _hashes(a: pd.DataFrame, b: pd.DataFrame) -> tuple[int, int]:
    ca, cb = _canon_pair(a, b)
    return (int(pd.util.hash_pandas_object(ca, index=False).sum()),
            int(pd.util.hash_pandas_object(cb, index=False).sum()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.names or list(qs)
    results, failures = {}, 0
    for name in names:
        try:
            got = _to_pandas(qs[name](args.sf))
            if name not in oracles:
                results[name] = {"rows": len(got), "oracle": None}
                continue
            exp = con.execute(oracles[name]).df()
            ha, hb = _hashes(got, exp)
            dtm = _dtype_mismatches(got, exp)
            r = {
                "rows_match": len(got) == len(exp),
                "schema_match": sorted(got.columns) == sorted(exp.columns),
                "hash_match": ha == hb,
                "dtype_ok": not dtm,
                "rows": len(got), "oracle_rows": len(exp),
            }
            if dtm:
                r["dtype_mismatch"] = dtm
            if not all(v for k, v in r.items()
                       if k.endswith("_match") or k == "dtype_ok"):
                failures += 1
            results[name] = r
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"{type(ex).__name__}: {ex}"}
            failures += 1
    # single line, printed LAST: Ray workers may interleave log lines
    # into stdout mid-run, so consumers should parse the final line
    print(json.dumps(results, default=str))
    print(f"# {len(names)} queries, {failures} failures", file=sys.stderr)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
