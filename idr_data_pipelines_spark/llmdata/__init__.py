"""Large-scale training-data operators (beyond reference parity).

Exact + near deduplication, embedding similarity search, text
analysis, and multimodal binary-column plumbing — the operator set a
100 TB training-data pipeline needs, designed shuffle-first:
every near-dup algorithm is a *bucket-then-compare* plan (candidate
generation via hashing → equi-join on bucket id → exact verify inside
buckets) so the quadratic comparison never touches the full corpus.
"""

from idr_data_pipelines_spark.llmdata.dedup import (
    connected_components,
    dedup_cluster_collapse,
    dedup_exact,
    dedup_exact_hash_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_md5_lsh_pairs,
    md5_hash32,
    md5_shingle_hashes,
    ngram_jaccard_pairs,
    shingle_hashes,
    shingle_hashes_positional,
    simhash_signatures,
    simhash_near_dup_pairs,
)
from idr_data_pipelines_spark.llmdata.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_ivf_fixed,
    cosine_topk_lsh,
    cosine_topk_quantized,
    quantize_unit_vec,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_grouped,
    ivf_centroids,
)
from idr_data_pipelines_spark.llmdata.text import (
    bpe_token_estimate,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    winnow_fingerprint_table,
    winnow_fingerprints,
    winnow_md5_fingerprints,
)
from idr_data_pipelines_spark.llmdata.multimodal import (
    decode_image_stub,
    extract_media_meta,
    frame_sample_stub,
    with_binary_payload,
)
from idr_data_pipelines_spark.llmdata.sketches import (
    count_min_build,
    hll_estimate_from_registers,
    hll_md5_registers,
    count_min_estimate,
    count_min_topk,
)
from idr_data_pipelines_spark.llmdata.sampling import (
    hash_bucket,
    mix_weighted,
    mix_weighted_repeat,
    pack_sequences,
    sample_hash_mod,
    sample_stratified,
    sample_token_budget,
    split_train_holdout,
)
from idr_data_pipelines_spark.llmdata.decontaminate import (
    benchmark_ngrams,
    contamination_scores,
    decontaminate,
)
from idr_data_pipelines_spark.llmdata.filters import (
    add_repetition_features,
    dup_line_fraction,
    dup_word_fraction,
    gopher_repetition_pass,
    repetition_metrics,
    top_ngram_fraction,
)
from idr_data_pipelines_spark.llmdata.redact import (
    pii_counts,
    redact_pii,
    scrub_documents,
)

__all__ = [
    "connected_components",
    "dedup_cluster_collapse",
    "dedup_exact",
    "dedup_exact_hash_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_md5_lsh_pairs",
    "md5_hash32",
    "md5_shingle_hashes",
    "ngram_jaccard_pairs",
    "shingle_hashes",
    "shingle_hashes_positional",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_ivf_fixed",
    "cosine_topk_lsh",
    "cosine_topk_quantized",
    "quantize_unit_vec",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_grouped",
    "ivf_centroids",
    "bpe_token_estimate",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
    "winnow_fingerprint_table",
    "winnow_fingerprints",
    "winnow_md5_fingerprints",
    "decode_image_stub",
    "extract_media_meta",
    "frame_sample_stub",
    "with_binary_payload",
    "count_min_build",
    "hll_estimate_from_registers",
    "hll_md5_registers",
    "count_min_estimate",
    "count_min_topk",
    "hash_bucket",
    "mix_weighted",
    "mix_weighted_repeat",
    "pack_sequences",
    "sample_hash_mod",
    "sample_stratified",
    "sample_token_budget",
    "split_train_holdout",
    "benchmark_ngrams",
    "contamination_scores",
    "decontaminate",
    "add_repetition_features",
    "dup_line_fraction",
    "dup_word_fraction",
    "gopher_repetition_pass",
    "repetition_metrics",
    "top_ngram_fraction",
    "pii_counts",
    "redact_pii",
    "scrub_documents",
]
