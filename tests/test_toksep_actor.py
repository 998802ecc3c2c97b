"""Shared-vocabulary toksep actor stage: build → encode → sidecar decode."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from packcol.codecs import EncodedColumn, get_codec
from packcol.sources.webtext import generate_partition
from packcol.stages.toksep_actor import (TokSepSharedEncoder,
                                         build_shared_vocab,
                                         write_shared_vocab)


@pytest.fixture()
def sample_files(tmp_path):
    paths = []
    for i in range(3):
        t = generate_partition(i, 400)
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def test_shared_vocab_roundtrip(sample_files, tmp_path):
    out = str(tmp_path / "enc")
    os.makedirs(out, exist_ok=True)
    vocabs = build_shared_vocab(sample_files, ["html", "text"])
    assert len(vocabs["html"]) > 100
    write_shared_vocab(out, vocabs)
    enc_stage = TokSepSharedEncoder(out, ["html", "text"])
    # a batch from a file the sample saw AND one it did not (OOV drift)
    for part in (0, 7):
        t = generate_partition(part, 300)
        for col in ("html", "text"):
            arr = t.column(col).combine_chunks()
            enc = enc_stage.encode_column(arr, col)
            assert enc.params["n_shared"] == len(vocabs[col])
            # self-describing roundtrip through the flat row form
            enc2 = EncodedColumn.from_row(enc.to_row())
            enc2.base_dir = out
            dec = get_codec("toksep").decode(enc2)
            assert dec.to_pylist() == arr.to_pylist()
            assert dec.type == arr.type


def test_shared_vocab_kills_aux_duplication(sample_files, tmp_path):
    out = str(tmp_path / "enc")
    os.makedirs(out, exist_ok=True)
    write_shared_vocab(out, build_shared_vocab(sample_files, ["html"]))
    stage = TokSepSharedEncoder(out, ["html"])
    plain = get_codec("toksep")
    shared_aux = plain_aux = 0
    for part in range(3):
        arr = generate_partition(part, 400).column("html").combine_chunks()
        shared_aux += len(stage.encode_column(arr, "html").buffers["aux"])
        plain_aux += len(plain.encode(arr).buffers["aux"])
    # per-part patch dictionaries are a small fraction of the per-part
    # full dictionaries the plain codec ships
    assert shared_aux < plain_aux * 0.35


def test_shared_vocab_deterministic(sample_files, tmp_path):
    v1 = build_shared_vocab(sample_files, ["html"])
    v2 = build_shared_vocab(sample_files, ["html"])
    assert v1["html"].equals(v2["html"])


def test_decode_without_base_dir_raises(sample_files, tmp_path):
    out = str(tmp_path / "enc")
    os.makedirs(out, exist_ok=True)
    write_shared_vocab(out, build_shared_vocab(sample_files, ["html"]))
    stage = TokSepSharedEncoder(out, ["html"])
    arr = generate_partition(0, 50).column("html").combine_chunks()
    enc = stage.encode_column(arr, "html")
    enc.base_dir = None
    with pytest.raises(ValueError, match="base_dir"):
        get_codec("toksep").decode(enc)


def test_nulls_and_empty_rows(sample_files, tmp_path):
    out = str(tmp_path / "enc")
    os.makedirs(out, exist_ok=True)
    write_shared_vocab(out, build_shared_vocab(sample_files, ["html"]))
    stage = TokSepSharedEncoder(out, ["html"])
    arr = pa.array([b"<html>x</html>", None, b"", b"zz-never-seen-tok"],
                   type=pa.large_binary())
    enc = stage.encode_column(arr, "html")
    enc.base_dir = out
    dec = get_codec("toksep").decode(enc)
    assert dec.to_pylist() == arr.to_pylist()


def test_encode_files_shared_vocab(tmp_path, ray_session):
    import glob
    from packcol.pipelines.encode_pipeline import encode_files, verify_files
    from packcol.sources.webtext import write_webtext
    src = str(tmp_path / "wt")
    write_webtext(src, 2000, 4)
    paths = sorted(glob.glob(src + "/*.parquet"))
    out = str(tmp_path / "enc")
    m = encode_files(paths, out, resume=False, target_bytes=1 << 20,
                     shared_vocab_columns=["html", "text"])
    assert m["rows"] == 2000
    sidecar = os.path.join(out, "_shared", "toksep_html.ipc")
    assert os.path.exists(sidecar)
    inv = verify_files(out)
    assert inv == {"rows": 2000, "mismatches": 0}
    # resume MUST reuse the sidecar (old parts reference it by name)
    mtime = os.path.getmtime(sidecar)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    os.remove(os.path.join(out, parts[0]))
    pid = parts[0][len("part-"):-len(".parquet")]
    os.remove(os.path.join(out, "_manifest", pid + ".json"))
    m2 = encode_files(paths, out, resume=True, target_bytes=1 << 20,
                      shared_vocab_columns=["html", "text"])
    assert os.path.getmtime(sidecar) == mtime
    assert verify_files(out) == {"rows": 2000, "mismatches": 0}
    assert m2["rows"] == 2000


def test_recompact_shared_vocab_dir(tmp_path, ray_session):
    """Recompacting a shared-vocab store: decode resolves the sidecar,
    merged parts re-encode self-describing (no sidecar dependency)."""
    import glob
    import pyarrow.parquet as pq
    from packcol.pipelines.compact import recompact
    from packcol.pipelines.encode_pipeline import encode_files
    from packcol.stages.encode import decode_rows
    from packcol.sources.webtext import write_webtext
    src = str(tmp_path / "wt")
    write_webtext(src, 1000, 4)
    out = str(tmp_path / "enc")
    encode_files(sorted(glob.glob(src + "/*.parquet")), out, resume=False,
                 target_bytes=1 << 19, shared_vocab_columns=["html"])
    dest = str(tmp_path / "merged")
    res = recompact(out, dest, merge_factor=4)
    assert res["rows"] == 1000
    # merged parts decode WITHOUT the sidecar present
    rows = 0
    for p in sorted(glob.glob(dest + "/*.parquet")):
        t = decode_rows(pq.read_table(p))   # no base_dir on purpose
        rows += t.num_rows
    assert rows == 1000
