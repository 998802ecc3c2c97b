"""Vectorized text-analysis kernels: token counting, quality features,
language-ID heuristic, document fingerprinting.

All kernels operate on Arrow string columns via zero-copy buffer views —
no Python loop over rows (the engine-wide rule inherited from the
reference's branch-free inner loops,
/root/reference/src/encoding/naive.rs:14-16).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs.fsst import buffer_view


def _filled_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    return buffer_view(arr)


def token_counts(arr: pa.Array) -> np.ndarray:
    """Whitespace token count per row (single-space-separated text).
    SQL parity: length(text) - length(replace(text,' ','')) + 1 (0 when
    empty)."""
    d, offs = _filled_view(arr)
    cs = np.zeros(len(d) + 1, dtype=np.int64)
    np.cumsum(d == 32, out=cs[1:])
    spaces = cs[offs[1:]] - cs[offs[:-1]]
    lens = np.diff(offs)
    return np.where(lens > 0, spaces + 1, 0)


def token_hashes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, row_ids): 64-bit polynomial hash of every whitespace
    token, flat across rows.  The building block for unique-token counts,
    minhash shingles, simhash."""
    d, offs = _filled_view(arr)
    n_rows = len(offs) - 1
    if len(d) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    is_sep = d == 32
    # token start positions: non-sep preceded by sep/row-boundary
    starts_mask = ~is_sep
    prev_sep = np.ones(len(d), dtype=bool)
    prev_sep[1:] = is_sep[:-1]
    row_starts = offs[:-1][np.diff(offs) > 0]
    boundary = np.zeros(len(d) + 1, dtype=bool)
    boundary[row_starts] = True
    tok_start = starts_mask & (prev_sep | boundary[:len(d)])
    # rolling polynomial hash over bytes, reset at token starts:
    # h[i] = h[start..i]; computed via prefix powers trick
    tok_id = np.cumsum(tok_start) - 1
    n_tok = int(tok_id[-1]) + 1 if len(tok_id) else 0
    keep = ~is_sep
    positions = np.flatnonzero(keep)
    b = d[keep].astype(np.uint64)
    t_id = tok_id[keep]
    # first byte position of each token (tokens appear in order)
    first_mask = np.ones(len(t_id), dtype=bool)
    first_mask[1:] = t_id[1:] != t_id[:-1]
    tok_first = positions[first_mask]
    # hash: sum over bytes of (b+1) * P^(pos_in_token), mod 2^64
    pos = positions - tok_first[t_id]
    contrib = (b + np.uint64(1)) * _power_table(int(pos.max()) + 1
                                                if len(pos) else 1)[pos]
    hashes = np.zeros(n_tok, dtype=np.uint64)
    np.add.at(hashes, t_id, contrib)
    hashes = _splitmix64(hashes)
    # row of each token
    tok_row = np.searchsorted(offs, tok_first, side="right") - 1
    return hashes, tok_row.astype(np.int64)


_HASH_P = np.uint64(1099511628211)


def _power_table(n: int) -> np.ndarray:
    """[P^0, P^1, ... P^(n-1)] mod 2^64, vectorized (cumprod wraps)."""
    if n <= 1:
        return np.ones(max(n, 1), dtype=np.uint64)
    t = np.full(n, _HASH_P, dtype=np.uint64)
    t[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        return np.cumprod(t, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def unique_token_counts(arr: pa.Array) -> np.ndarray:
    """Distinct-token count per row (SQL:
    len(list_distinct(str_split(text,' ')))).  Vectorized: sort
    (row, hash) pairs, count group changes."""
    hashes, rows = token_hashes(arr)
    n = len(arr)
    if len(hashes) == 0:
        return np.zeros(n, dtype=np.int64)
    order = np.lexsort((hashes, rows))
    r, h = rows[order], hashes[order]
    new = np.ones(len(h), dtype=bool)
    new[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
    return np.bincount(r[new], minlength=n).astype(np.int64)


# --- quality scoring -------------------------------------------------------

def quality_features(text: pa.Array) -> dict[str, np.ndarray]:
    """Length / token / lexical-diversity features per row."""
    d, offs = _filled_view(text)
    n_chars = np.diff(offs)
    n_tok = token_counts(text)
    n_uniq = unique_token_counts(text)
    cs_alpha = np.zeros(len(d) + 1, dtype=np.int64)
    np.cumsum((d >= 97) & (d <= 122) | (d >= 65) & (d <= 90),
              out=cs_alpha[1:])
    n_alpha = cs_alpha[offs[1:]] - cs_alpha[offs[:-1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        return {
            "n_chars": n_chars.astype(np.int64),
            "n_tokens": n_tok,
            "n_unique_tokens": n_uniq,
            "alpha_ratio": np.where(n_chars > 0, n_alpha / n_chars, 0.0),
            "lexical_diversity": np.where(n_tok > 0, n_uniq / n_tok, 0.0),
            "avg_token_len": np.where(
                n_tok > 0, (n_chars - (n_tok - 1)) / np.maximum(n_tok, 1),
                0.0),
        }


# --- language ID (n-gram / stopword heuristic; no external data) ----------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
    "it": ["il", "la", "che", "di", "non", "per", "una", "sono"],
    "pt": ["o", "a", "os", "que", "de", "um", "uma", "para"],
    "nl": ["de", "het", "een", "van", "en", "is", "niet", "dat"],
}


def lang_id(text: pa.Array) -> pa.Array:
    """Heuristic language-ID: argmax of stopword hit-rate per language.
    'und' when nothing matches.  Vectorized via token-hash membership."""
    hashes, rows = token_hashes(text)
    n = len(text)
    scores = np.zeros((len(_LANG_MARKERS), n), dtype=np.int64)
    for li, (lang, words) in enumerate(sorted(_LANG_MARKERS.items())):
        marker_h = _hash_words(words)
        hit = np.isin(hashes, marker_h)
        if hit.any():
            scores[li] = np.bincount(rows[hit], minlength=n)
    langs = sorted(_LANG_MARKERS)
    best = scores.argmax(axis=0)
    any_hit = scores.max(axis=0) > 0
    out = np.where(any_hit, best, -1)
    choices = pa.array(langs + ["und"])
    return pc.take(choices, pa.array(np.where(out < 0, len(langs), out)))


def _hash_words(words: list[str]) -> np.ndarray:
    arr = pa.array([" ".join(words)])
    h, _ = token_hashes(arr)
    return h


# --- document fingerprint (rolling hash over the whole text) ---------------

def fingerprints(text: pa.Array) -> np.ndarray:
    """64-bit polynomial rolling-hash fingerprint of each row's bytes —
    the content-identity key for exact dedup at scale (hash first,
    compare inside groups)."""
    d, offs = _filled_view(text)
    n = len(offs) - 1
    if len(d) == 0:
        return np.zeros(n, dtype=np.uint64)
    lens = np.diff(offs)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos_in_row = np.arange(len(d), dtype=np.int64) - np.repeat(offs[:-1], lens)
    powers = _power_table(int(pos_in_row.max()) + 1)
    contrib = (d.astype(np.uint64) + np.uint64(1)) * powers[pos_in_row]
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, row_of, contrib)
    return _splitmix64(out + lens.astype(np.uint64))


def redact(text: pa.Array, pattern: str, replacement: str) -> pa.Array:
    """Vectorized regex redaction (PII scrub / normalization): RE2 via
    pyarrow.compute.replace_substring_regex — identical match semantics
    to DuckDB's regexp_replace(..., 'g'), so the transform is
    SQL-oracle-checkable.  Nulls pass through."""
    return pc.replace_substring_regex(text, pattern=pattern,
                                      replacement=replacement)
