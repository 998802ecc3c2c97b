"""upsert_encoded: key-scoped MERGE over the encoded store."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from packcol.pipelines.encode_pipeline import encode_files
from packcol.pipelines.upsert import upsert_encoded
from packcol.sources.encoded import read_encoded


def _mkstore(tmp_path, df, name="st", target=1 << 13):
    src = tmp_path / f"{name}.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(src), row_group_size=200)
    out = str(tmp_path / f"{name}_store")
    encode_files([str(src)], out, target_bytes=target)
    return out


@pytest.fixture()
def base_df():
    rng = np.random.default_rng(5)
    n = 1500
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64),
        "s": rng.choice(list("xyz"), n)})


def _read_sorted(store):
    got = read_encoded(store).to_pandas()
    return got.sort_values("id").reset_index(drop=True)[["id", "v", "s"]]


def test_upsert_update_and_insert(tmp_path, ray_session, base_df):
    import ray.data as rd
    out = _mkstore(tmp_path, base_df)
    upd = base_df[(base_df.id >= 100) & (base_df.id < 300)].copy()
    upd["v"] = -1
    ins = pd.DataFrame({"id": np.arange(9000, 9020, dtype=np.int64),
                        "v": np.int64(7), "s": "new"})
    new = pd.concat([upd, ins])
    r = upsert_encoded(out, rd.from_pandas(new), "id")
    assert r["rows_inserted"] == len(new)
    assert r["rows_deleted"] == len(upd)
    exp = pd.concat([base_df[(base_df.id < 100) | (base_df.id >= 300)],
                     new]).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(_read_sorted(out), exp[["id", "v", "s"]])
    # untouched parts are pruned, not rewritten: the update keys are a
    # contiguous id range, so most parts were never opened
    assert r["parts_scanned"] < len(
        [f for f in os.listdir(out) if f.endswith(".parquet")])


def test_upsert_idempotent_rerun(tmp_path, ray_session, base_df):
    import ray.data as rd
    out = _mkstore(tmp_path, base_df)
    new = base_df.head(50).copy()
    new["v"] = 999
    upsert_encoded(out, rd.from_pandas(new), "id")
    snap = _read_sorted(out)
    r2 = upsert_encoded(out, rd.from_pandas(new), "id")
    # same content → same content-addressed parts, shielded from the
    # retire delete → nothing changes
    assert r2["rows_deleted"] == 0
    pd.testing.assert_frame_equal(_read_sorted(out), snap)


def test_upsert_null_keys_are_inserts(tmp_path, ray_session, base_df):
    import ray.data as rd
    out = _mkstore(tmp_path, base_df)
    new = pd.DataFrame({"id": pd.array([0, None, None], dtype="Int64"),
                        "v": np.int64(5), "s": "n"})
    r = upsert_encoded(out, rd.from_pandas(new), "id")
    assert r["rows_inserted"] == 3
    assert r["rows_deleted"] == 1  # only id=0 replaced
    got = read_encoded(out).to_pandas()
    assert got["id"].isna().sum() == 2
    assert len(got) == len(base_df) + 2


def test_upsert_bad_key_raises(tmp_path, ray_session, base_df):
    import ray.data as rd
    out = _mkstore(tmp_path, base_df)
    ds = rd.from_pandas(base_df.head(3))
    with pytest.raises(ValueError, match="single column"):
        upsert_encoded(out, ds, ["id", "v"])
    with pytest.raises(ValueError, match="not in dataset schema"):
        upsert_encoded(out, ds, "nope")
    # a failed upsert must not leave a staging dir behind
    assert not [d for d in os.listdir(out) if d.startswith("_upsert-")]


def test_upsert_string_key(tmp_path, ray_session):
    import ray.data as rd
    df = pd.DataFrame({"k": [f"u{i:03d}" for i in range(400)],
                       "v": np.arange(400, dtype=np.int64)})
    out = _mkstore(tmp_path, df, name="s2")
    new = pd.DataFrame({"k": ["u005", "u399", "brand-new"],
                        "v": np.int64([-5, -399, -1])})
    upsert_encoded(out, rd.from_pandas(new), "k")
    got = read_encoded(out).to_pandas().set_index("k")["v"]
    assert got["u005"] == -5 and got["u399"] == -399
    assert got["brand-new"] == -1
    assert len(got) == 401


def test_upsert_randomized_vs_pandas(tmp_path, ray_session):
    """Fuzz: repeated random upserts match a pandas MERGE truth."""
    import ray.data as rd
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "id": np.arange(800, dtype=np.int64),
        "v": rng.integers(0, 50, 800).astype(np.int64),
        "s": rng.choice(list("abc"), 800)})
    out = _mkstore(tmp_path, df, name="fz")
    live = df.copy()
    for turn in range(4):
        ids = rng.choice(2000, size=rng.integers(10, 120), replace=False)
        new = pd.DataFrame({
            "id": np.sort(ids).astype(np.int64),
            "v": np.int64(-(turn + 1)),
            "s": rng.choice(list("abcz"), len(ids))})
        upsert_encoded(out, rd.from_pandas(new), "id")
        live = pd.concat([live[~live.id.isin(new.id)], new])
        got = _read_sorted(out)
        exp = live.sort_values("id").reset_index(drop=True)[
            ["id", "v", "s"]]
        pd.testing.assert_frame_equal(got, exp)


def test_attach_store_union(tmp_path, ray_session):
    """attach_store merges two shards: metadata-first renames, dedupe
    on content-addressed ids, result readable as the union."""
    from packcol.pipelines.upsert import attach_store
    a = pd.DataFrame({"id": np.arange(0, 300, dtype=np.int64),
                      "v": np.int64(1)})
    b = pd.DataFrame({"id": np.arange(300, 500, dtype=np.int64),
                      "v": np.int64(2)})
    sa = _mkstore(tmp_path, a, name="sha")
    sb = _mkstore(tmp_path, b, name="shb")
    r = attach_store(sb, sa)
    assert r["parts_attached"] > 0 and r["parts_deduped"] == 0
    assert r["rows_attached"] == 200
    got = read_encoded(sa).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    exp = pd.concat([a, b]).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "v"]], exp)
    # source drained (move=True)
    assert not [f for f in os.listdir(sb) if f.endswith(".parquet")]
    # zone pruning still works on the attached parts (manifests moved)
    from packcol.sources.encoded import count_encoded
    assert count_encoded(sa, ("id", "between", 300, 499)) == 200


def test_attach_store_dedupe_and_copy(tmp_path, ray_session):
    """encode_files part ids derive from the input's absolute path +
    row-group slice, so the SAME file encoded into two stores yields
    identical part ids — attach coalesces them instead of duplicating
    rows."""
    from packcol.pipelines.upsert import attach_store
    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "v": np.int64(3)})
    src = tmp_path / "dup.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(src), row_group_size=200)
    sa, sb = str(tmp_path / "dupa_store"), str(tmp_path / "dupb_store")
    encode_files([str(src)], sa)
    encode_files([str(src)], sb)
    r = attach_store(sb, sa, move=False)
    assert r["parts_deduped"] > 0 and r["parts_attached"] == 0
    assert len(read_encoded(sa).to_pandas()) == 100  # no duplication
    # copy mode leaves the source intact
    assert [f for f in os.listdir(sb) if f.endswith(".parquet")]


def test_attach_store_refuses_shared_vocab(tmp_path, ray_session):
    from packcol.pipelines.upsert import attach_store
    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64)})
    sa = _mkstore(tmp_path, df, name="sva")
    sb = _mkstore(tmp_path, df, name="svb")
    os.makedirs(os.path.join(sb, "_shared"))
    with pytest.raises(ValueError, match="shared-vocab"):
        attach_store(sb, sa)


def test_attach_store_collision_raises(tmp_path, ray_session):
    """Same part id (same absolute input path + slice) but DIFFERENT
    bytes — the file was rewritten between the two encodes — must
    refuse: overwriting would drop the destination's rows."""
    from packcol.pipelines.upsert import attach_store
    src = tmp_path / "same.parquet"
    sa, sb = str(tmp_path / "c1_store"), str(tmp_path / "c2_store")
    for store, val in ((sa, 1), (sb, 2)):
        df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                           "v": np.int64(val)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(src), row_group_size=200)
        encode_files([str(src)], store)
    with pytest.raises(ValueError, match="collision"):
        attach_store(sb, sa)
