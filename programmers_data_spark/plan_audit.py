"""Plan governance: the engine's physical-plan policy, auditable.

Every registered query carries an implicit scale contract — pure-JVM
expressions unless declared Arrow-tier, no unbounded cartesian
products, no single-partition funnels on SF-growing data. This module
owns the policy (the allowlists live HERE, next to the operators they
describe, not inside a test) and exposes it two ways: `audit_all` for
`python -m programmers_data_spark audit` (lint every query's executed
plan before a deploy) and as the data behind
tests/test_scale.py::test_plan_policy_audit (the same policy enforced
in CI).

An allowlist entry is a DOCUMENTED exception, not an excuse: each name
below appears because its docstring explains why the node is bounded
(a 1-row broadcast aggregate, a capped ground-truth twin, an Arrow
kernel that IS the operator). A new query that trips a rule either
gets redesigned or earns its entry with the same justification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Queries whose OPERATOR is an Arrow/Python kernel (mapInPandas /
# applyInPandas GEMMs, signature passes, codecs) — vectorized batch
# kernels, never row-at-a-time UDFs. Everything else must plan as
# pure JVM expressions (whole-stage-codegen eligible).
PYTHON_TIER = frozenset({
    "dedup_minhash", "dedup_simhash", "embedding_neardup",
    "embedding_neardup_lsh", "ann_lsh_topk", "ivf_topk",
    "ann_recall_at5",  # composes ann_lsh_topk's signature pass
    "ivf_recall_at5",  # composes ivf_topk's cell-assignment pass
    "ivf_probe_sweep",  # same index build + probe-all Arrow pass
    "lsh_neardup_recall",  # composes both near-dup GEMM kernels
    "token_heavy_hitters",  # Arrow candidate pass (per-batch top-K)
    "multimodal_decode", "multimodal_features",
    "multimodal_audio_meta",  # Arrow audio-probe IS the operator
    "multimodal_png_roundtrip",  # Arrow PNG encode+decode roundtrip
    "minhash_jaccard_estimate",  # reuses the Arrow signature pass
    "near_dup_rate_by_source",  # composes dedup_minhash
    "split_neardup_leakage",  # composes dedup_minhash
    "cross_source_dup_matrix",  # composes dedup_minhash
    "neardup_incremental",  # composes the Arrow signature store
    "pipeline_funnel_contract",  # composes the pair store's Arrow
    #                              signature pass (curate_corpus path)
    "dedup_semantic",  # Arrow cell-assignment GEMM (SemDeDup)
    "embedding_topk",  # fold_cos_scores: exact serial-fold cosine as
    #                    a dimension-major Arrow pass (r17)
    "hard_negatives",  # fold_cos_scores (label-carried scoring pass)
    "rrf_fusion",  # fold_cos_scores (cos + dot from one pass)
    "contrastive_training_pairs",  # fold_cos_scores (label-carried)
    "knn_label_vote",  # fold_cos_scores (label-carried scoring pass)
    "sq8_topk_recall",  # fold_cos_scores + dequant transform; also
    #                     composes embedding_topk's pass
    "mrl_truncation_recall",  # fold_cos_scores + truncation transform;
    #                           also composes embedding_topk's pass
    "embedding_cos_topk",  # fold_cos_pairs: exact Arrow rerank of
    #                        the published-store probe candidates (r17)
    "pq_topk",  # Arrow PQ encode + LUT-gather ADC scan
    "pq_recall_at5",  # composes pq_topk's Arrow kernels
    "bpe_encoded_counts",  # Arrow merge-rank encoder IS the operator
    "bpe_contract",  # composes bpe_encoded_counts' Arrow encoder
    "unigram_encoded_counts",  # Arrow Viterbi encoder IS the operator
    "wordpiece_encoded_counts",  # Arrow greedy-match encoder IS the
    #                              operator (oracle: recursive CTE)
    "ivf_incremental_assign",  # Arrow batch-assign GEMM + the full
    #                            index's assignment pass it audits
    "embedding_neardup_incremental",  # arrival-batch signature GEMM
    #                            probing the published LSH sig store
    "embedding_neardup_clusters_incremental",  # composes the same
    #                            arrival GEMM via the pair delta
    "image_dhash",  # Arrow PNG encode/decode + perceptual-hash kernel
    "image_neardup_pairs",  # composes image_dhash's Arrow hash table
    "image_neardup_clusters",  # same hash table + component labels
    "image_lsh_recall",  # composes the same Arrow hash table
    "image_resize_hash_invariance",  # Arrow resize-path hash kernel
    "crossmodal_dup_consistency",  # composes the image hash kernel
    #                                AND dedup_minhash's Arrow pass
    "image_neardup_incremental",  # composes the image hash kernel
    "audio_fingerprint",  # Arrow WAV encode/decode + fingerprint kernel
    "audio_neardup_pairs",  # composes the audio fingerprint table
    "audio_neardup_clusters",  # same table + component labels
    "audio_lsh_recall",  # composes the same Arrow fingerprint table
    "video_framehash",  # Arrow per-frame PNG codec + XOR-fold kernel
    "video_neardup_pairs",  # composes the video fingerprint table
    "video_neardup_clusters",  # same table + component labels
    "video_lsh_recall",  # composes the same Arrow video kernel
    "audio_neardup_incremental",  # engine arrivals pay the WAV kernel
    "video_neardup_incremental",  # engine arrivals pay the PNG kernel
    "stream_audio_neardup_ingest",  # per-batch WAV kernel in replay
    "stream_video_neardup_ingest",  # per-batch PNG kernel in replay
    "image_hamming_topk",  # reads the store the image kernel produces
    "audio_hamming_topk",  # reads the store the audio kernel produces
    "video_hamming_topk",  # reads the store the video kernel produces
    "media_curation_report",  # composes the four published pair stores
    "split_media_leakage",  # same four published pair stores
    "eval_contamination_audit",  # same four published pair stores
    "dedup_threshold_sweep",  # same four published pair stores
    #                           (text Arrow signature pass + media kernels
    #                            pay once in the store producers)
    "image_neardup_clusters_incremental",  # store producer runs the
    #                                         image kernel + pair delta
    "audio_neardup_clusters_incremental",  # store producer runs the
    #                                         audio kernel + pair delta
    "video_neardup_clusters_incremental",  # store producer runs the
    #                                         video kernel + pair delta
    "text_jaccard_topk",  # composes the Arrow signature pass (the
    #                       dedup_minhash path, threshold-free rerank)
    "stream_text_neardup_ingest",  # per-batch Arrow signature pass
    #                                in the replay harness
    "text_neardup_clusters_incremental",  # composes the pair store's
    #                                       Arrow signature pass + the
    #                                       arrival delta's batch pass
    "crossmodal_quadmodal_consistency",  # composes the image + audio
    #                                      + video kernels AND
    #                                      dedup_minhash's Arrow pass
    "multimodal_funnel_contract",  # composes the pair store's Arrow
    #                                signature pass + both media hash
    #                                kernels (curate_corpus media path)
})

# Queries planning a BroadcastNestedLoopJoin/CartesianProduct whose
# broadcast side is provably bounded: a 1-row aggregate (thresholds,
# totals, global max), a fixed query set, or an intentionally capped
# ground-truth twin for an LSH path.
BOUNDED_CARTESIAN = frozenset({
    "adaptive_quality_gate",   # 1-row p25 threshold broadcast
    "ann_recall_at5",          # bounded query set crossJoin (via ANN)
    "bpe_contract",            # crossJoins two 1-row corpus aggregates
    "ivf_recall_at5",          # same, via ivf_topk
    "pq_recall_at5",           # same, via embedding_topk baseline
    "contrastive_training_pairs",  # broadcast bounded query set
    "ccnet_perplexity_bands",  # 1-row doc-count broadcast into the
    #                            band arithmetic (distributed_rank)
    "collocation_lift",        # 1-row corpus-occurrence-total broadcast
    "vocab_growth_curve",      # 1-row doc-id min/max bounds broadcast
    "source_bigram_overlap",   # dimension-sized (n_sources rows) vocab
    #                            size table non-equi self-pairing
    "corpus_mixture_weights",  # 1-row corpus totals broadcast
    "dsir_importance_proxy",   # 1-row target-source + totals broadcasts
    "curriculum_phases",       # 1-row corpus-count broadcast into
    #                            the phase division
    "cross_source_dup_matrix",  # 1-row pair-total broadcast
    "dup_rate_threshold_sweep",  # 5-row literal threshold frame
    "ivf_probe_sweep",         # 5-row literal nprobe grid BNLJ +
    #                            broadcast bounded query set x corpus
    #                            at the full-probe endpoint
    "sq8_topk_recall",         # broadcast bounded query set x corpus
    #                            (dequantized), composes embedding_topk
    "mrl_truncation_recall",   # broadcast bounded query set x corpus
    #                            (truncated), composes embedding_topk
    "dedup_clusters",          # capped (doc_id<120) ground-truth twin
    "dedup_keep_canonical",    # same capped twin
    "embedding_topk",          # broadcast bounded query set x corpus
    "hard_negatives",          # broadcast bounded query set x corpus
    "rrf_fusion",              # broadcast bounded query set x corpus
    "idle_rich_customers",     # Q22 scalar-subquery 1-row broadcast
    "ingest_freshness",        # 1-row global-max broadcast
    "knn_label_vote",          # broadcast bounded query set
    "ks_drift_by_source",      # <=256-row bucket-CDF + 1-row total
    #                            broadcasts into the source grid
    "ngram_jaccard",           # capped (doc_id<60) ground-truth twin
    "rfm_segments",            # 1-row now-date + count broadcasts
    "scd2_point_in_time",      # 1-row open-interval-cap broadcast
    #                            (max probe ts) into the range join
    "skew_profile",            # 1-row total broadcast
    "source_vocab_divergence",  # |sources| x capped-vocab grid +
    #                             1-row corpus-total broadcast
    "supplier_value_share",    # Q11 scalar-subquery 1-row broadcast
    "tfidf_shingle_pairs",     # 1-row corpus-size broadcast into idf
    "token_budget_allocation",  # 1-row shortfall broadcast
    "token_heavy_hitters",     # 1-row total-count broadcast
    "volume_anomaly_days",     # two 1-row robust-stat broadcasts
})

# Queries planning an Exchange SinglePartition that carries a provably
# tiny input: 1-row global aggregates feeding a broadcast, or a
# final single-row result.
BOUNDED_SINGLE_PARTITION = frozenset({
    "adaptive_quality_gate", "ann_recall_at5", "bpe_contract",
    "ccnet_perplexity_bands",  # 1-row doc-count agg + <=65-row
    #                            distributed_rank offset fold
    "dsir_importance_proxy",  # 1-row distribution-totals aggregate
    "curriculum_phases",  # 1-row corpus-count agg feeds the broadcast
    "cross_source_dup_matrix",  # 1-row pair-total agg feeds the share
    "collocation_lift",  # 1-row occurrence-total agg feeds the lift
    "vocab_growth_curve",  # 1-row bounds agg + <=N_CHECKPOINTS-row
    #                        running-sum window
    "ivf_recall_at5",
    "ivf_probe_sweep",  # 1-row query/exact-count aggs + 5-row
    #                     verdict window
    "ks_drift_by_source",  # <=256-row global-CDF fold + 1-row total
    "pipeline_funnel_contract",  # six 1-row stage-count aggregates
    "multimodal_funnel_contract",  # same six 1-row stage aggregates
    "pq_recall_at5", "lsh_neardup_recall", "corpus_mixture_weights", "curation_funnel",
    "discounted_revenue", "forecast_revenue_change",
    "idle_rich_customers", "incr_mau_refresh", "ingest_freshness",
    "rfm_segments",  # 1-row max-date/count aggs feed the broadcasts
    "scd2_point_in_time",  # 1-row max-probe-ts cap aggregate
    "skew_profile", "small_qty_revenue",
    "source_temperature_weights",  # bounded per-source fold (1 row)
    "token_budget_allocation",     # composes the fold + 1-row agg
    "supplier_value_share",
    "table_profile", "tfidf_shingle_pairs", "token_heavy_hitters",
    "top_supplier",
    "volume_anomaly_days",
    "daily_revenue_dense",  # 1-row min/max bounds agg feeds the spine
    "ewma_daily_revenue",   # bounded daily series folds in one row
    "ivf_incremental_assign",  # 1-row contract aggregate
})

_PYTHON_MARKERS = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
    "FlatMapGroupsInPandas",
)


def audit_plan(name: str, df: DataFrame) -> list[str]:
    """Flags for one query's executed plan; empty list = clean."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if name not in PYTHON_TIER and any(m in plan for m in _PYTHON_MARKERS):
        flags.append("python-node outside the declared Arrow tier")
    if name not in BOUNDED_CARTESIAN and (
        "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    ):
        flags.append("cartesian/nested-loop join not declared bounded")
    if name not in BOUNDED_SINGLE_PARTITION and (
        "Exchange SinglePartition" in plan
    ):
        flags.append("single-partition exchange not declared bounded")
    return flags


def audit_all(
    spark: SparkSession, sf_dir: str
) -> dict[str, list[str]]:
    """Audit every registered batch query; returns only the flagged
    ones (streaming queries execute on call, so they are audited by
    their own plan-shape tests instead)."""
    from . import registry

    registry.load_all()
    flagged: dict[str, list[str]] = {}
    for name, fn in sorted(registry.QUERIES.items()):
        if name.startswith("stream_"):
            continue
        flags = audit_plan(name, fn(spark, sf_dir))
        if flags:
            flagged[name] = flags
    return flagged
