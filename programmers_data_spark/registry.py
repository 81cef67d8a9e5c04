"""Named query registry — the driver contract behind __spark_entry__.py.

Each query is registered under a stable name together with (usually)
a DuckDB-runnable oracle SQL string. The driver runs the Spark
callable and the oracle side-by-side at sf0.01 and compares row count,
schema, and an order-insensitive value hash; column names therefore
must match exactly between the two forms.

Queries whose semantics are not SQL-expressible (streaming state,
iterative algorithms) register without an oracle and get a weaker
rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Import order only populates the registry; the driver's 50-query
# CORRECTNESS window is pinned EXPLICITLY in _WINDOW below (round-4
# advice: never derive the window from import-time availability).
_QUERY_MODULES = (
    "programmers_data_spark.queries.loads",  # 6
    "programmers_data_spark.queries.transforms",  # 7 (→13)
    "programmers_data_spark.queries.text_ops",  # 15 (→28)
    "programmers_data_spark.queries.dedup_ops",  # 7 (→35)
    "programmers_data_spark.queries.round3_ops",  # 11 (→46)
    "programmers_data_spark.queries.streaming_ops",  # 14 incl. the
    #   unconditionally-registered, call-time-gated tws query and its
    #   dependency-free applyInPandasWithState twin (→60)
    "programmers_data_spark.queries.summary",  # 5 (→65)
    "programmers_data_spark.queries.text_quality_ops",  # 8 (→73)
    "programmers_data_spark.queries.curation_ops",  # 10 (→83)
    "programmers_data_spark.queries.extras",  # 25 (→108)
    "programmers_data_spark.queries.similarity_ops",  # 11 (→119)
    "programmers_data_spark.queries.multimodal_ops",  # 6 (→125)
    "programmers_data_spark.queries.analytics",  # 19 (→144)
    "programmers_data_spark.queries.subqueries",  # 8 (→152)
    "programmers_data_spark.queries.accuracy_ops",  # 6 (→158)
    "programmers_data_spark.queries.sampling_ops",  # 11 (→169)
    "programmers_data_spark.queries.retrieval_ops",  # 12 (→181)
    "programmers_data_spark.queries.sketch_ops",  # 3 (→184)
    "programmers_data_spark.queries.timeseries_ops",  # 3 (→187)
    "programmers_data_spark.queries.tokenizer_ops",  # 4 (→191)
    "programmers_data_spark.queries.interchange_ops",  # 2 (→193)
    "programmers_data_spark.queries.quality_lm_ops",  # 3 (→196)
    "programmers_data_spark.queries.batching_ops",  # 2 (→198)
    "programmers_data_spark.queries.corpus_stats_ops",  # 3 (→201)
    "programmers_data_spark.queries.round10_ops",  # 9 (→210)
    "programmers_data_spark.queries.round11_ops",  # 16 (→226)
    "programmers_data_spark.queries.round12_ops",  # 10 (→236)
    "programmers_data_spark.queries.round13_ops",  # 10 (→246)
    "programmers_data_spark.queries.media_lifecycle_ops",  # 10 (→256)
    "programmers_data_spark.queries.round14_ops",  # 4 (→260)
    "programmers_data_spark.queries.round15_ops",  # 3 (→263)
    "programmers_data_spark.queries.round16_ops",  # 5 (→268)
    "programmers_data_spark.queries.round17_ops",  # 2 (→270)
)

# The round the current _WINDOW below is authored FOR. The rotation
# bookkeeping test (tests/test_round9.py::
# test_rotation_backlog_arithmetic) derives every expected count from
# the CORRECTNESS_r*.json records with round < WINDOW_ROUND — the
# record state the plan was authored against — so the driver dropping
# this round's (or any later) record file can never falsify the test
# (r9 VERDICT defect #1: the r9 version hand-pinned the as-of-builder
# state and self-expired the moment CORRECTNESS_r09.json landed).
WINDOW_ROUND = 17

# ROUND-18 ROTATION PLAN: group 1 (leads) is NEXT_WINDOW_LEADS below
# (EMPTY after r17 — every never-driver-checked oracled registration
# took an r17 window slot), then round-18 NEW registrations
# (never-driver-checked outranks stale refreshes — the standing
# principle), then 2-3 round-17-green sentinels on whatever the r18
# diff touches, then the backlog: the REMAINING 23-name r12 tail (in
# registration order: curation_funnel, neardup_incremental,
# event_path_trigrams, rfm_segments, hard_negatives, rrf_fusion,
# label_centroid_drift, multimodal_audio_meta,
# source_temperature_weights, token_budget_allocation,
# curriculum_phases, training_manifest, tfidf_shingle_pairs,
# bpe_contract, dedup_keep_best_quality, stream_upsert_publish,
# image_dhash, image_neardup_pairs, image_neardup_clusters,
# image_lsh_recall, image_resize_hash_invariance, audio_fingerprint,
# audio_neardup_pairs — derive from the records as always: names
# whose latest green round is 12), then the r13 tier in (vintage,
# registration-order) order to fill 50. Keep stream_tws_value_stats
# OUTSIDE the window (honestly gated: google.protobuf absent,
# installs disallowed — semantics driver-certified r6 via the
# applyInPandasWithState twin). Bump WINDOW_ROUND to 18 in the same
# commit that rewrites the groups — the bookkeeping test keys on it.

# Queries registered WITHOUT an oracle, by design (k-means float
# centroid training isn't summation-order-portable SQL, BPE merge
# iteration, HLL sketch internals). Each has a hash-checkable
# accuracy-contract twin that IS oracle-checked (ivf_recall_at5,
# pq_recall_at5, semantic_dedup_recall, bpe_contract,
# mau_approx_error). Round 8 removed ann_lsh_topk and
# embedding_neardup_lsh from this set: md5-derived integer plane
# weights + fixed-point components (similarity_ops._SIG_SCALE) made
# their signatures exactly reproducible in DuckDB — the same trick
# that upgraded dedup_simhash in r4. tests/test_round5.py derives the
# window's expected rows-only set from this list — keep it in sync
# with registration (test_registry_hygiene asserts equality).
ROWS_ONLY = frozenset({
    "bpe_encoded_counts", "bpe_merges",
    "dedup_semantic", "ivf_topk",
    "mau_approx", "pq_topk",
    # round 11: float EM posteriors / Viterbi under them aren't ANSI
    # SQL (k-means/BPE precedent); the E-step machinery is
    # hash-certified by unigram_em_contract, seeding by
    # unigram_seed_vocab.
    "unigram_lm_probs", "unigram_encoded_counts",
})

# The first 50 names get_queries() yields — i.e. the names the
# driver verifies this round (round WINDOW_ROUND = 14; r10 VERDICT
# ask #2). The window is the concatenation of four explicit groups
# so the bookkeeping test can check each group's defining property
# against the record instead of hand-kept counts.

# Group 1 — never-driver-checked registrations from earlier rounds:
# the two late-r16 registrations queued in r16's NEXT_WINDOW_LEADS
# (the r16 VERDICT's explicit "the r17 window MUST lead with them"):
# the vector family's published-pair-store report reads — exact
# basis-point threshold sweep and per-label dup-rate. Both are
# oracle-certified in-suite and READ the store the r16-green
# maintenance rows certify.
_WINDOW_LEADS = (
    "embedding_threshold_sweep",
    "embedding_dup_rate_by_label",
)

# Group 2 — round-17 NEW registrations (never driver-checked): the
# embedding family's published-store READ paths (r16 VERDICT ask #4
# — close the serving asymmetry): cos top-K serving that probes the
# published bucketed signature store (no per-run signature
# derivation), and the cluster-size health profile over the
# published pair store. Both carry full oracles composed from the
# registered embedding_neardup_lsh fragments.
_WINDOW_NEW = (
    "embedding_cos_topk",
    "embedding_cluster_profile",
)

# Group 3 — r16-green sentinels sitting directly on the round-17
# diff: the three *_clusters_incremental queries re-certify the
# star-contraction merge after it moved into the ONE shared
# operators.merge_clusters engine (r16 VERDICT ask #5) — one
# sentinel per rewired tier (text wrapper, embedding wrapper, and
# the media engine's incremental_clusters via the audio spec).
_WINDOW_SENTINELS = (
    "text_neardup_clusters_incremental",
    "embedding_neardup_clusters_incremental",
    "audio_neardup_clusters_incremental",
)

# Group 4 — stale tiers oldest-first, in registration order: the
# COMPLETE 19-name r11 tail (latest green driver row r11 — the
# oldest vintage after r16 drained the r10 tier and the first 27
# r11 names), then the first 24 of the 47-name r12 tier. The
# trimmed 23-name r12 tail (curation_funnel onward) leads the r18
# backlog per the ROUND-18 ROTATION PLAN above.
_WINDOW_STALE = (
    # r11 tail — drains the tier completely
    "segment_overlap_sketch",
    "cms_heavy_hitters",
    "rolling_7d_revenue",
    "daily_revenue_dense",
    "ewma_daily_revenue",
    "session_stats",
    "unigram_seed_vocab",
    "unigram_em_contract",
    "ivf_incremental_assign",
    "scd2_point_in_time",
    "zorder_prune_contract",
    "copurchase_pairs",
    "rp_project",
    "rp_distance_contract",
    "triangle_counts",
    "time_weighted_value",
    "wordpiece_encoded_counts",
    "ks_drift_by_source",
    "pipeline_funnel_contract",
    # r12 tier, registration-order prefix (24 of 47)
    "incr_distinct",
    "corpus_sample_hash",
    "pii_redact",
    "vocab_topk",
    "top_terms_per_doc",
    "doc_chunks",
    "dedup_minhash",
    "ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_keep_canonical",
    "minhash_jaccard_estimate",
    "sequence_packing",
    "packing_spans",
    "repetition_profile",
    "gopher_quality_flags",
    "dedup_prefix",
    "stratified_sample",
    "shingle_novelty",
    "code_fraction_by_source",
    "decontam_overlap",
    "doc_commonness",
    "dedup_incremental",
    "table_profile",
)

_WINDOW = _WINDOW_LEADS + _WINDOW_NEW + _WINDOW_SENTINELS + _WINDOW_STALE

# Never-driver-checked registrations that could not take a window
# slot without evicting protected stale names queue here, and the
# NEXT round's window MUST lead with them (the bookkeeping test
# asserts this tuple is EXACTLY the never-checked set outside the
# window). EMPTY after round 17: the r16 leads and both r17 NEW
# registrations all hold window slots, so no oracled registration
# is waiting on a driver check.
NEXT_WINDOW_LEADS: tuple[str, ...] = ()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] (+ oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators populate the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def _window_order(names: dict[str, object]) -> list[str]:
    """Pinned-window ordering: _WINDOW first, rest in registration
    order. Asserts the window is exactly 50 known, distinct names so
    a refactor can't silently shift the driver contract."""
    assert len(_WINDOW) == 50, f"window has {len(_WINDOW)} names, want 50"
    assert len(set(_WINDOW)) == 50, "duplicate names in _WINDOW"
    missing = [n for n in _WINDOW if n not in QUERIES]
    assert not missing, f"_WINDOW names not registered: {missing}"
    rest = [n for n in names if n not in set(_WINDOW)]
    return [n for n in _WINDOW if n in names] + rest


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return {n: QUERIES[n] for n in _window_order(QUERIES)}


def get_oracle_sql() -> dict[str, str]:
    load_all()
    return {n: ORACLE[n] for n in _window_order(ORACLE)}
