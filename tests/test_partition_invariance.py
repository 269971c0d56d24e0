"""Partition-count invariance: the queries whose floats are rounded
BECAUSE summation order is partitioning-dependent must produce
identical driver-facing results under different shuffle-partition
settings — this is exactly the variance between a local[8] test run
and the driver's local[32] session (or a 1000-executor cluster).
"""

from __future__ import annotations

import pytest

from idr_data_pipelines_spark.queries import QUERIES

# the rounded-float and hash-keyed queries most exposed to
# partitioning-dependent evaluation order
NAMES = [
    "graph_pagerank",
    "emb_label_centroids",
    "text_perplexity_unigram",
    "mm_embed_stub",
    "evt_windowed_quantiles",
    "flagship_event_analytics",
    # round-6 additions: rounded means (kmeans), float-threshold kept
    # set (semdedup), ln-ranked selection (weighted sample), ratio
    # flag (shared ngrams), exact-k md5 rank cuts
    "emb_kmeans_step",
    "emb_semdedup",
    "sample_weighted_k",
    "text_shared_ngrams",
    "sample_exact_k",
    "sample_topk_per_group",
    # session-2 additions with ratio/percentile/candidate outputs
    "quality_buckets",
    "dedup_winnow_pairs",
    "dedup_containment",
    "evt_transitions",
    "evt_user_perplexity",
    "rfm_segments",
    # session-3 additions: ln-scored rankings (rounded before the
    # rank, so the order must survive repartitioning) and the
    # scaled-int standardization (exact sums by construction)
    "text_tfidf_topterm",
    "text_bm25_topk",
    "emb_standardize",
    "evt_anomaly_zscore",
    "basket_pairs",
    "graph_khop",
    "evt_path_analysis",
    "orders_cohort_ltv",
    # late session-3 analytics: global-cumulative rank cuts (abc),
    # ratio outputs, ln-free but rounded shares
    "orders_abc_analysis",
    "evt_dau_stickiness",
    "evt_new_vs_returning",
    "evt_ab_test",
    "text_dup_chunk_ratio",
    "snapshot_diff",
    # round-7 additions: rounded distances feeding an argmin (PQ),
    # rounded scores feeding ntile cuts (ccnet), ratio outputs
    "emb_pq_assign",
    "docs_ccnet_buckets",
    "skew_metrics",
    "evt_survival_retention",
    "text_bigram_lm",
    "text_char_stats",
    "docs_gopher_rules",
    # round-7 session 2: rounded bigram means (summation-order
    # sensitive by construction) and cross-doc text reassembly
    "text_perplexity_bigram",
    "docs_remove_dup_chunks",
    # round-7 session 3: md5-ordered shard positions, pow-rounded
    # shares, global-cumulative rank cuts, quality-argmax keepers
    "corpus_shuffle_shards",
    "mix_temperature",
    "text_vocab_coverage",
    "dedup_keep_best",
    "decontaminate_report",
    "orders_basket_lift",
    "dedup_minhash_incremental",
    "emb_matryoshka_truncate",
    "emb_sign_hamming",
    # round-7 session 4: integer hit counts + rank cuts off bit-exact
    # fold cosines (recall/knn), order-free scaled-int sums
    # (covariance), md5 rank cuts vs a data-derived floor (balanced),
    # first-occurrence integer rollups (novelty)
    "ann_recall_eval",
    "emb_knn_graph",
    "emb_covariance",
    "sample_balanced_labels",
    "docs_ngram_novelty",
    # round-7 session 5: md5 buckets + round-6 log means (dsir),
    # integer edge rollups (label agreement), integer counts + round-6
    # OLS over a pinned top-50 (zipf), scaled-int group moments with
    # fixed-order divides (norm outliers)
    "docs_dsir_weights",
    "emb_label_agreement",
    "docs_zipf_lexical",
    "emb_norm_outliers",
    # integer rank cuts off bit-exact fold cosines (hard negatives);
    # 9-decimal covariance inputs + round-6 outputs (power iteration)
    "emb_hard_negatives",
    "emb_power_iteration",
    # round-7 session 6: rounded lag-weighted means (ewma), jaccard
    # rank ties picked by min_by struct (leakage), rounded shares
    # (langid audit), interpolated-percentile boundary membership
    # (length outliers)
    "dq_expectations",
    "evt_ewma_rolling",
    "dedup_cross_split_leakage",
    "docs_langid_audit",
    "docs_length_outliers",
    # batch 2: data-elected merge feeding a top-k cut (bpe round),
    # mapInPandas fan-out (audio windows), rounded fold dot products
    # off a power-iteration-derived vector (pca project)
    "text_bpe_merge_round",
    "mm_audio_windows",
    "emb_pca_project",
    # batch 4: band-candidate set + rounded estimator ratios
    # (minhash calibration), degree-keyed orientation (triangles)
    "dedup_minhash_estimate",
    "graph_triangles",
    # exact decimal moments + rounded-cv flag
    "evt_bot_regularity",
    # pow-rounded epoch shares; e6-int cell means off fold cosines
    "mix_curriculum",
    "emb_ivf_stats",
    # per-user running-max lateness; delta-algebra exact cent sums
    "evt_late_arrival_audit",
    "ivm_join_delta",
    # integer common-neighbor counts + rank cut; e6-int PQ error means
    "graph_link_prediction",
    "emb_pq_error",
    # min-label closure over real LSH pairs
    "dedup_minhash_clusters",
    # pair rollup over LSH candidates; rounded entropy from sums
    "docs_source_overlap",
    "evt_user_activity_entropy",
    # exact decimal CUPED moments, fixed-order theta/rho algebra
    "evt_ab_cuped",
    # r09 window additions (first driver exposure): rounded ADC fold
    # sums + recall ratios (ivfpq pair), e6 fixed-point absorption
    # (markov), exact e6 cell moments (did), LSH-cluster min-label
    # closure feeding the split hash (cluster-safe split)
    "ann_ivfpq_recall",
    "ann_topk_ivfpq",
    "evt_attribution_markov",
    "evt_did_readout",
    "split_cluster_safe",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.collect()
    )


@pytest.mark.parametrize("name", NAMES)
def test_partition_count_invariance(name, spark, sf_dir):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _canon(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _canon(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert low == high, f"{name} changed under repartitioning"
