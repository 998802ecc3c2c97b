"""FSST shared-symbol-table actor-pool stage tests."""

import pyarrow as pa
import pytest

from packcol.codecs import EncodedColumn, get_codec
from packcol.sources.webtext import write_webtext
from packcol.stages.fsst_actor import FsstEncodeActor, build_shared_table


@pytest.fixture(scope="module")
def webtext(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wt"))
    return write_webtext(d, n_rows=2000, n_parts=2, seed=42)


def test_shared_table_deterministic(webtext):
    t1 = build_shared_table(webtext, ["text", "url"])
    t2 = build_shared_table(webtext, ["text", "url"])
    for c in ("text", "url"):
        assert t1[c][0].tolist() == t2[c][0].tolist()
        assert t1[c][1].tolist() == t2[c][1].tolist()
        assert len(t1[c][1]) > 10  # found a useful table


def test_actor_encode_roundtrip(webtext):
    import pyarrow.parquet as pq
    actor = FsstEncodeActor(webtext, ["text", "url"])
    batch = pq.read_table(webtext[0], columns=["text", "url"])
    enc_rows = actor(batch)
    assert enc_rows.num_rows == 2
    for i, name in enumerate(enc_rows.column("column").to_pylist()):
        row = {k: enc_rows.column(k)[i].as_py()
               for k in ("codec", "n_values", "params", "payload")}
        dec = get_codec("fsst").decode(EncodedColumn.from_row(row))
        assert dec.equals(batch.column(name).combine_chunks()), name
    # compression actually happened with the shared table
    assert (sum(enc_rows.column("enc_bytes").to_pylist())
            < sum(enc_rows.column("orig_bytes").to_pylist()))


def test_fallback_on_code_byte_collision(webtext):
    actor = FsstEncodeActor(webtext, ["text"])
    code_byte = int(actor.tables["text"][0][0])
    poisoned = pa.array(["normal text here", f"has {chr(code_byte)} byte"],
                        type=pa.large_string())
    batch = pa.table({"text": poisoned})
    enc_rows = actor(batch)
    row = {k: enc_rows.column(k)[0].as_py()
           for k in ("codec", "n_values", "params", "payload")}
    dec = get_codec("fsst").decode(EncodedColumn.from_row(row))
    assert dec.to_pylist() == poisoned.to_pylist()


def test_via_ray_actor_pool(webtext, ray_session):
    import ray.data as rd
    ds = rd.read_parquet(webtext)
    enc = ds.map_batches(
        FsstEncodeActor(webtext, ["text"]),
        batch_format="pyarrow", batch_size=500, concurrency=2, num_cpus=1)
    rows = enc.to_pandas()
    assert rows["n_values"].sum() == 2000
    assert (rows["codec"] == "fsst").all()


def test_autoscaling_actor_pool(webtext, ray_session):
    """Actor pool with (min, max) autoscaling concurrency."""
    import ray.data as rd
    ds = rd.read_parquet(webtext)
    enc = ds.map_batches(
        FsstEncodeActor,   # class (not instance) → autoscaling pool
        fn_constructor_kwargs={"sample_paths": webtext,
                               "columns": ["text"]},
        batch_format="pyarrow", batch_size=250,
        concurrency=(1, 3), num_cpus=1)
    assert enc.to_pandas()["n_values"].sum() == 2000
