"""packcol — a Ray-Data-native per-column lightweight-compression engine.

Generalizes the bit-packed-encoding ideas of COMBINE-lab/kmers
(/root/reference: 2-bit symbol packing `src/encoding/naive.rs:116-124`,
word-aligned packed buffers `src/naive_impl/seq_vector.rs:141-161`,
canonical-form normalization `src/naive_impl/kmer.rs:55-74`) into a full
lightweight codec suite — dictionary, RLE, FSST-lite, bit-packing,
frame-of-reference — with per-partition codec auto-selection, run as
`ray.data.Dataset` pipelines of `map_batches` over zero-copy Arrow batches.

Layout:
  codecs/     pure numpy/pyarrow codec kernels (no Ray)
  functions/  value-level kernels: DNA parity (kmers golden tests), text
              analysis, hashing/sketches
  stages/     map_batches stage callables (stats sampler, encoders, verify)
  pipelines/  end-to-end Dataset pipelines (encode/decode/verify, dedup, ANN)
  sources/    deterministic synthetic webtext generator (FIXTURES.md F1)
  state/      checkpoint/resume manifests
"""

from ._malloc import tune_malloc as _tune_malloc

_tune_malloc()

__version__ = "0.1.0"


def __getattr__(name):
    """Convenience top-level API (lazy so `import packcol` stays light):
    packcol.encode_files / decode_files / verify_files / curate /
    count_canonical_kmers / column_profile."""
    _map = {
        "encode_files": "packcol.pipelines.encode_pipeline",
        "decode_files": "packcol.pipelines.encode_pipeline",
        "verify_files": "packcol.pipelines.encode_pipeline",
        "spot_check_files": "packcol.pipelines.encode_pipeline",
        "encode_dataset": "packcol.pipelines.encode_pipeline",
        "decode_dataset": "packcol.pipelines.encode_pipeline",
        "curate": "packcol.pipelines.curation",
        "dedup_exact": "packcol.pipelines.dedup",
        "minhash_lsh_pairs": "packcol.pipelines.dedup",
        "count_canonical_kmers": "packcol.pipelines.kmers",
        "column_profile": "packcol.stages.profile",
        "write_webtext": "packcol.sources.webtext",
        "read_encoded": "packcol.sources.encoded",
        "query": "packcol.sources.encoded",
        "agg_encoded": "packcol.sources.encoded",
        "count_distinct_encoded": "packcol.sources.encoded",
        "approx_distinct_encoded": "packcol.sources.encoded",
        "topk_encoded": "packcol.sources.encoded",
        "merge_join_clustered": "packcol.pipelines.join",
        "cluster_store": "packcol.pipelines.cluster",
        "zorder_store": "packcol.pipelines.cluster",
        "diff_stores": "packcol.pipelines.diff",
        "agg_encoded_rollup": "packcol.sources.encoded",
        "explain_scan": "packcol.sources.encoded",
        "bm25_topk": "packcol.pipelines.search",
        "pearson_corr": "packcol.stages.profile",
        "stratified_sample": "packcol.pipelines.window",
        "lag_column": "packcol.pipelines.window",
        "hopping_window_aggregate": "packcol.pipelines.window",
        "ann_pq_topk": "packcol.pipelines.ann",
        "build_ivfpq_store": "packcol.pipelines.ann_index",
        "ivfpq_query_store": "packcol.pipelines.ann_index",
        "fit_bigram_lm": "packcol.pipelines.quality",
        "perplexity_filter": "packcol.pipelines.quality",
    }
    if name in _map:
        import importlib
        return getattr(importlib.import_module(_map[name]), name)
    raise AttributeError(name)
