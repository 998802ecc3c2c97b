"""check_store / repair_store: store consistency audit."""
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from packcol.pipelines.encode_pipeline import encode_files
from packcol.pipelines.fsck import check_store, repair_store


@pytest.fixture()
def store(tmp_path, ray_session):
    rng = np.random.default_rng(17)
    n = 1000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], n),
        "v": rng.random(n)})
    src = tmp_path / "f.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(src), row_group_size=100)
    out = str(tmp_path / "f_store")
    encode_files([str(src)], out, target_bytes=1 << 12)
    return out


def test_clean_store_ok(store):
    r = check_store(store, deep=True)
    assert r["ok"], r["issues"]
    assert r["parts_total"] > 1


def test_detects_orphans_and_stale(store):
    # orphan manifest + bloom: remove a part file but keep sidecars
    part = sorted(f for f in os.listdir(store)
                  if f.endswith(".parquet"))[0]
    os.remove(os.path.join(store, part))
    # stale staging dir + tmp file, backdated past the liveness window
    old = time.time() - 7200
    stale_dir = os.path.join(store, "_upsert-deadbeef")
    os.makedirs(stale_dir)
    os.utime(stale_dir, (old, old))
    tmp = os.path.join(store, "part-x.parquet.tmp-12345678")
    with open(tmp, "w") as fh:
        fh.write("junk")
    os.utime(tmp, (old, old))
    r = check_store(store)
    msgs = [m for _, m in r["issues"]]
    assert any("orphan manifest" in m for m in msgs)
    assert any("stale upsert staging" in m for m in msgs)
    assert any("stale writer tmp" in m for m in msgs)
    rep = repair_store(store)
    assert len(rep["removed"]) >= 3
    r2 = check_store(store)
    assert r2["ok"], r2["issues"]


def test_detects_corrupt_zone(store):
    """A lying zone map (claims max smaller than the data) is exactly
    the corruption that silently breaks pushdown — deep check flags."""
    from packcol.state.manifest import Manifest
    man = Manifest(store)
    ms = man.load_all()
    pid = ms[0]["part_id"]
    m = man.load(pid)
    m["zones"]["id"]["max"] = -1
    man.record(pid, m)
    r_shallow = check_store(store)
    assert r_shallow["ok"]  # structural layers can't see it
    r = check_store(store, deep=True)
    assert not r["ok"]
    assert any("escape zone" in m for _, m in r["issues"])


def test_detects_row_count_mismatch(store):
    from packcol.state.manifest import Manifest
    man = Manifest(store)
    pid = man.load_all()[0]["part_id"]
    m = man.load(pid)
    m["rows"] = m["rows"] + 1
    man.record(pid, m)
    r = check_store(store)
    assert any("manifest rows" in msg for _, msg in r["issues"])


def test_detects_bad_n_cols(store):
    part = sorted(f for f in os.listdir(store)
                  if f.endswith(".parquet"))[0]
    p = os.path.join(store, part)
    t = pq.read_table(p)
    i = t.schema.get_field_index("n_cols")
    t = t.set_column(i, "n_cols",
                     pa.array([99] * t.num_rows, type=pa.int64()))
    pq.write_table(t, p)
    r = check_store(store)
    assert any("n_cols" in msg for _, msg in r["issues"])


def test_deep_fsck_catches_payload_tamper(ray_session, tmp_path):
    """A part file modified after its manifest was recorded (bit rot,
    foreign writer) fails the deep digest check."""
    import numpy as np
    import pandas as pd
    from packcol.pipelines.encode_pipeline import encode_files
    from packcol.pipelines.fsck import check_store
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "v": np.arange(500, dtype=np.int64) % 7})
    raw = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), raw,
                   row_group_size=100)
    out = str(tmp_path / "t_enc")
    encode_files([raw], out, target_bytes=1 << 12)
    assert check_store(out, deep=True)["ok"]
    part = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))[0]
    p = os.path.join(out, part)
    data = bytearray(open(p, "rb").read())
    data[len(data) // 2] ^= 0xFF  # flip one byte mid-file
    open(p, "wb").write(bytes(data))
    res = check_store(out, deep=True)
    assert not res["ok"]
    assert any("digest" in msg or "unreadable" in msg
               for _, msg in res["issues"])
