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
)

# The round the current _WINDOW below is authored FOR. The rotation
# bookkeeping test (tests/test_round9.py::
# test_rotation_backlog_arithmetic) derives every expected count from
# the CORRECTNESS_r*.json records with round < WINDOW_ROUND — the
# record state the plan was authored against — so the driver dropping
# this round's (or any later) record file can never falsify the test
# (r9 VERDICT defect #1: the r9 version hand-pinned the as-of-builder
# state and self-expired the moment CORRECTNESS_r09.json landed).
WINDOW_ROUND = 15

# ROUND-16 ROTATION PLAN: group 1 (leads) MUST be NEXT_WINDOW_LEADS
# below (stream_text_neardup_ingest,
# text_neardup_clusters_incremental — the late r15 registrations
# that landed after the window filled), then round-16 NEW
# registrations (group 2;
# never-driver-checked outranks stale refreshes — the standing
# principle), then 2-3 round-15-green sentinels on whatever the r16
# diff touches, then the backlog: the REMAINING 15-name r10 tail
# (in registration order: sq8_topk_recall, mrl_truncation_recall,
# phrase_match_positional, embedding_chunk_pool,
# orc_partitioned_roundtrip, collocation_lift, vocab_growth_curve,
# source_bigram_overlap, token_freq_spectrum, skipgram_cooccurrence,
# quality_linear_score, cdc_apply_tombstones, neardup_cluster_profile,
# ivf_probe_sweep, lang_confidence_margin — derive from the records
# as always: names whose latest green round is 10), then the r11
# tier in (vintage, registration-order) order to fill 50. Keep
# stream_tws_value_stats OUTSIDE the window (honestly gated:
# google.protobuf absent, installs disallowed — semantics
# driver-certified r6 via the applyInPandasWithState twin). Bump
# WINDOW_ROUND to 16 in the same commit that rewrites the groups —
# the bookkeeping test keys on it.

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
# the three late-r14 registrations queued in r14's NEXT_WINDOW_LEADS
# (the r14 VERDICT's explicit "the r15 window MUST lead with them"):
# the multimodal report tier's split-leakage gate, benchmark
# decontamination audit, and dedup threshold-tuning sweep. All three
# are oracle-certified in-suite and compose ONLY the published pair
# stores the r14-green report/funnel queries certify.
_WINDOW_LEADS = (
    "split_media_leakage",
    "eval_contamination_audit",
    "dedup_threshold_sweep",
)

# Group 2 — round-15 NEW registrations (never driver-checked): the
# audio/video incremental CLUSTER maintenance legs (the engine's
# star-contraction merge, completing incremental maintenance at
# every lifecycle level for every modality — r14 VERDICT ask #5) and
# the text tier's serving read path (MinHash band candidates + exact
# Jaccard rerank top-K, completing serving parity across all five
# dedup families — ask #8). All three carry full oracles.
_WINDOW_NEW = (
    "audio_neardup_clusters_incremental",
    "video_neardup_clusters_incremental",
    "text_jaccard_topk",
)

# Group 3 — r14-green sentinels sitting directly on the round-15
# diff: image_neardup_clusters_incremental runs the SAME
# media_index.incremental_clusters engine path the two new cluster
# queries instantiate; stream_image_neardup_ingest re-certifies
# streaming_ingest under the r15 _INGEST_CACHE memo-key change (r14
# ADVICE #1); media_curation_report re-certifies the report tier
# under the derived-modality-grid refactor (r14 ADVICE #4).
_WINDOW_SENTINELS = (
    "image_neardup_clusters_incremental",
    "stream_image_neardup_ingest",
    "media_curation_report",
)

# Group 4 — stale tiers oldest-first, in registration order: the
# COMPLETE 9-name r9 tail (latest green driver row r9 — the oldest
# vintage after r14 drained the first 39), then the first 32 of the
# 47-name r10 tier. The trimmed 15-name r10 tail (sq8_topk_recall
# onward) leads the r16 backlog per the ROUND-16 ROTATION PLAN above.
_WINDOW_STALE = (
    # r9 tail — drains the tier completely
    "idle_rich_customers",
    "bulk_suppliers_for_parts",
    "mau_approx_error",
    "jsonl_shard_roundtrip",
    "lm_surprisal_bits",
    "ccnet_perplexity_bands",
    "blocklist_doc_flags",
    "length_bucket_batches",
    "oov_rate_by_vocab",
    # r10 tier, registration-order prefix (32 of 47)
    "scd2_intervals",
    "incr_mau_refresh",
    "token_heavy_hitters",
    "fuzzy_match_pairs",
    "stream_stateful_value_stats",
    "stream_late_data_audit",
    "dau",
    "channel_firstlast",
    "nps",
    "funnel_signup_purchase",
    "dup_span_scrub",
    "dup_rate_threshold_sweep",
    "ohlc_daily",
    "nation_pagerank",
    "mad_outliers",
    "ingest_freshness",
    "volume_anomaly_days",
    "embedding_topk",
    "embedding_neardup",
    "label_quality_profile",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_features",
    "ivf_recall_at5",
    "quantile_sketch_error",
    "pq_recall_at5",
    "train_val_split",
    "token_budget_sample",
    "mixture_resample",
    "split_leakage_check",
    "inverted_postings",
)

_WINDOW = _WINDOW_LEADS + _WINDOW_NEW + _WINDOW_SENTINELS + _WINDOW_STALE

# Never-driver-checked registrations that could not take a window
# slot without evicting protected stale names queue here, and the
# NEXT round's window MUST lead with them (the bookkeeping test
# asserts this tuple is EXACTLY the never-checked set outside the
# window). The two LATE round-15 registrations below landed after
# the r15 window filled (its 9+32 stale drain is the promised one);
# both are oracle-certified in-suite and compose machinery the
# in-window queries certify (the sig_frame Arrow kernel via
# text_jaccard_topk, the verified pair store via the report tier).
NEXT_WINDOW_LEADS: tuple[str, ...] = (
    "stream_text_neardup_ingest",
    "text_neardup_clusters_incremental",
)


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
