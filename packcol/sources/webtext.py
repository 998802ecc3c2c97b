"""Deterministic synthetic Common-Crawl-style webtext (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:large_binary,
    text:large_string, lang:string

Each partition is a pure function of ``(seed, part_id)`` so partitions
can be generated in parallel (Ray tasks) and regenerated bit-identically
for resume tests.  ``html = wrap(text)`` with sentinel markers so
``extract_text(html) == text`` byte-identical per url — the engine's
roundtrip invariant (the analogue of the reference's encode/decode
golden contract, /root/reference/src/encoding/naive.rs:296-313).

Properties exercised per column:
  url      — ~1000 Zipf domains, unique per row → FSST / sorted dict
  warc_ts  — clustered, small positive jitter + occasional back-jumps → FOR
  html     — wrapped text + tag soup; ~1% of rows 50-200x median → skew
  text     — Zipf word salad from a 5000-word vocab, 10-2000 words → FSST
  lang     — 20 values, Zipf(1.5), long runs → dict/RLE
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])

LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "it", "ja", "nl",
         "pl", "tr", "ar", "ko", "sv", "cs", "fi", "el", "he", "da"]

_HTML_PRE = b"<html><head><title>page</title></head><body><!--T-->"
_HTML_POST = b"<!--/T--><div class=\"footer\">"
_HTML_END = b"</div></body></html>"
_SOUP = (b"<span style=\"color:#a3f;margin:0 auto\" data-x=\"qz9\">"
         b"&nbsp;&amp;#x2603;</span><br/>")

_BASE_TS = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)


def _vocab(seed: int = 42, n_words: int = 5000) -> pa.Array:
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    lens = rng.integers(2, 12, size=n_words)
    total = int(lens.sum())
    chars = letters[rng.integers(0, 26, size=total)]
    offs = np.zeros(n_words + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    return pa.Array.from_buffers(
        pa.string(), n_words,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(chars.tobytes())])


_VOCAB_CACHE: dict[int, pa.Array] = {}


def _zipf_probs(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def generate_partition(part_id: int, n_rows: int, seed: int = 42) -> pa.Table:
    """One webtext partition — pure function of (seed, part_id, n_rows)."""
    rng = np.random.default_rng((seed << 20) + part_id)
    if seed not in _VOCAB_CACHE:
        _VOCAB_CACHE[seed] = _vocab(seed)
    vocab = _VOCAB_CACHE[seed]
    nv = len(vocab)

    # --- text: Zipf word salad, 10..2000 words per row -------------------
    n_words_row = (10 + (rng.pareto(1.6, size=n_rows) * 40)).astype(np.int64)
    np.clip(n_words_row, 10, 2000, out=n_words_row)
    total_words = int(n_words_row.sum())
    word_probs = _zipf_probs(nv, 1.1)
    flat_idx = rng.choice(nv, size=total_words, p=word_probs)
    words = pc.take(vocab, pa.array(flat_idx, type=pa.int64()))
    w_offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words_row, out=w_offs[1:])
    word_lists = pa.LargeListArray.from_arrays(
        pa.array(w_offs, type=pa.int64()), words)
    text = pc.binary_join(word_lists, " ").cast(pa.large_string())

    # --- html = PRE + text + POST + soup*k + END; ~1% heavy skew ---------
    soup_reps = rng.integers(0, 4, size=n_rows)
    heavy = rng.random(n_rows) < 0.01
    # median html ≈ 600 B ≈ 8 soup units; heavy rows get 50-200x median
    soup_reps = np.where(
        heavy, rng.integers(50, 200, size=n_rows) * 8, soup_reps)
    soup_lens = soup_reps * len(_SOUP)
    soup_offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(soup_lens, out=soup_offs[1:])
    # each row's soup is whole repetitions of the same pattern, so the
    # concatenated buffer is just the pattern repeated sum(reps) times
    # (bytes.__mul__ is a C memcpy loop — much faster than np.tile here)
    soup_buf = _SOUP * int(soup_reps.sum()) if n_rows else b""
    soup_arr = pa.Array.from_buffers(
        pa.large_binary(), n_rows,
        [None, pa.py_buffer(soup_offs.tobytes()), pa.py_buffer(soup_buf)])
    html = pc.binary_join_element_wise(
        pa.array([_HTML_PRE] * n_rows, type=pa.large_binary()),
        text.cast(pa.large_binary()),
        pa.array([_HTML_POST] * n_rows, type=pa.large_binary()),
        soup_arr,
        pa.array([_HTML_END] * n_rows, type=pa.large_binary()),
        pa.array([b""] * n_rows, type=pa.large_binary()))

    # --- lang: 20 values Zipf(1.5) in long runs --------------------------
    lang_codes = np.empty(n_rows, dtype=np.int64)
    run_len = rng.geometric(1.0 / 200.0, size=max(n_rows // 50, 8))
    run_lang = rng.choice(len(LANGS), size=len(run_len),
                          p=_zipf_probs(len(LANGS), 1.5))
    reps = np.repeat(run_lang, run_len)
    if len(reps) < n_rows:
        reps = np.tile(reps, n_rows // max(len(reps), 1) + 1)
    lang_codes = reps[:n_rows]
    lang = pc.take(pa.array(LANGS), pa.array(lang_codes, type=pa.int64()))

    # --- warc_ts: clustered, mostly-forward jitter, occasional back-jump -
    jitter = rng.integers(0, 3_600_000_000, size=n_rows)  # 0..3600 s in us
    back = rng.random(n_rows) < 0.02
    jitter = np.where(back, -jitter * 10, jitter)
    ts = _BASE_TS + np.int64(part_id) * 86_400_000_000 + np.cumsum(jitter)
    warc_ts = pa.array(ts, type=pa.int64()).cast(pa.timestamp("us"))

    # --- url: Zipf domains, unique per row -------------------------------
    dom_ids = rng.choice(1000, size=n_rows, p=_zipf_probs(1000, 1.2))
    path_words = pc.take(vocab, pa.array(
        rng.integers(0, nv, size=n_rows), type=pa.int64()))
    row_ids = pa.array([f"{part_id}-{i}" for i in range(n_rows)])
    url = pc.binary_join_element_wise(
        pa.array([f"https://d{d}.example.com/" for d in dom_ids]),
        path_words, row_ids, "/")

    return pa.table({"url": url, "warc_ts": warc_ts, "html": html,
                     "text": text, "lang": lang}, schema=SCHEMA)


def extract_text(html: bytes) -> bytes:
    """Inverse of the wrap: the bytes between the sentinel markers."""
    start = html.index(b"<!--T-->") + len(b"<!--T-->")
    end = html.index(b"<!--/T-->", start)
    return html[start:end]


def extract_text_batch(html: pa.Array) -> pa.Array:
    """Vectorized extract_text over a large_binary column."""
    from ..codecs.fsst import buffer_view
    d, offs = buffer_view(html)
    pre = len(_HTML_PRE)
    # text ends at the first b"<!--/T-->" after pre; since html is
    # PRE+text+POST+..., text length = find(POST marker) - pre.  The text
    # itself never contains "<!--/T-->" (vocab is [a-z ]), so search from
    # each row start is safe and vectorizable via the known layout:
    # row text length = total - fixed overhead - soup length; instead we
    # locate the marker with numpy matching on the 9-byte pattern.
    marker = np.frombuffer(b"<!--/T-->", dtype=np.uint8)
    # candidate-list scan: '<' is a few % of html bytes, so match the
    # first byte with one pass and verify the other 8 only at candidates
    # (gathers over the short candidate list, not 8 more full passes)
    limit = max(len(d) - len(marker) + 1, 0)
    cand = np.flatnonzero(d[:limit] == marker[0])
    ok = np.ones(len(cand), dtype=bool)
    for j in range(1, len(marker)):
        ok &= d[cand + j] == marker[j]
    hit_pos = cand[ok]
    # first hit within each row
    row_of_hit = np.searchsorted(offs, hit_pos, side="right") - 1
    first = np.full(len(html), -1, dtype=np.int64)
    # reverse iterate-free: unique rows keep first occurrence
    uniq, first_idx = np.unique(row_of_hit, return_index=True)
    first[uniq] = hit_pos[first_idx]
    starts = offs[:-1] + pre
    lens = first - starts
    # rows whose html lacks the sentinel marker (first == -1, e.g.
    # foreign/empty html) extract as "" — the caller's comparison then
    # reports them as mismatches instead of negative lens crashing
    # np.repeat below
    lens = np.maximum(lens, 0)
    from ..codecs.gather import concat_gather
    out, out_offs = concat_gather(d, starts, lens)
    return pa.Array.from_buffers(
        pa.large_string(), len(html),
        [None, pa.py_buffer(np.ascontiguousarray(out_offs)),
         pa.py_buffer(np.ascontiguousarray(out))])


def write_webtext(out_dir: str, n_rows: int, n_parts: int,
                  seed: int = 42, use_ray: bool = False) -> list[str]:
    """Write part-{i}.parquet files; returns the file list.  Cached: if
    the directory already holds files generated with the SAME
    (n_rows, n_parts, seed), generation is skipped; any parameter
    change regenerates everything (a bare existence check would
    silently mix splits from different configurations)."""
    import json as _json
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_gen_meta.json")
    meta = {"n_rows": n_rows, "n_parts": n_parts, "seed": seed}
    stale = True
    if os.path.exists(meta_path):
        try:
            stale = _json.load(open(meta_path)) != meta
        except (ValueError, OSError):
            stale = True
    if stale:  # wipe parts from any previous configuration
        for f in os.listdir(out_dir):
            if f.startswith("part-") and f.endswith(".parquet"):
                os.remove(os.path.join(out_dir, f))
        with open(meta_path, "w") as fh:
            _json.dump(meta, fh)
    rows_per = [n_rows // n_parts + (1 if i < n_rows % n_parts else 0)
                for i in range(n_parts)]
    paths = [os.path.join(out_dir, f"part-{i:05d}.parquet")
             for i in range(n_parts)]
    todo = [(i, p) for i, p in enumerate(paths) if not os.path.exists(p)]
    if not todo:
        return paths
    if use_ray:
        import ray

        @ray.remote
        def _gen(i, path, nr, seed):
            t = generate_partition(i, nr, seed)
            pq.write_table(t, path + ".tmp", compression="zstd",
                           row_group_size=2048)
            os.replace(path + ".tmp", path)
        ray.get([_gen.remote(i, p, rows_per[i], seed) for i, p in todo])
    else:
        for i, p in todo:
            t = generate_partition(i, rows_per[i], seed)
            pq.write_table(t, p + ".tmp", compression="zstd",
                           row_group_size=2048)
            os.replace(p + ".tmp", p)
    return paths
