"""Large-scale training-data operators (beyond reference parity).

Exact + near deduplication, embedding similarity search, text
analysis, and multimodal binary-column plumbing — the operator set a
100 TB training-data pipeline needs, designed shuffle-first:
every near-dup algorithm is a *bucket-then-compare* plan (candidate
generation via hashing → equi-join on bucket id → exact verify inside
buckets) so the quadratic comparison never touches the full corpus.
"""

from idr_data_pipelines_spark.llmdata.dedup import (
    dedup_exact,
    dedup_exact_hash_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_signatures,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
)
from idr_data_pipelines_spark.llmdata.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from idr_data_pipelines_spark.llmdata.text import (
    token_count,
    quality_score,
    lang_id,
    fingerprint,
)
from idr_data_pipelines_spark.llmdata.multimodal import (
    with_binary_payload,
    extract_media_meta,
    decode_image_stub,
)

__all__ = [
    "dedup_exact",
    "dedup_exact_hash_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "embedding_near_dup_pairs",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "with_binary_payload",
    "extract_media_meta",
    "decode_image_stub",
]
