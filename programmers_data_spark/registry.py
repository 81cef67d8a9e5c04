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
    "programmers_data_spark.queries.text_ops",  # 14 (→27)
    "programmers_data_spark.queries.dedup_ops",  # 7 (→34)
    "programmers_data_spark.queries.round3_ops",  # 10 (→44)
    "programmers_data_spark.queries.streaming_ops",  # 11 incl. the
    #   unconditionally-registered, call-time-gated tws query and its
    #   dependency-free applyInPandasWithState twin (→55)
    "programmers_data_spark.queries.summary",  # 5 (→60)
    "programmers_data_spark.queries.text_quality_ops",  # 6 (→66)
    "programmers_data_spark.queries.curation_ops",  # 5 (→71)
    "programmers_data_spark.queries.extras",  # 23 (→94)
    "programmers_data_spark.queries.similarity_ops",  # 7 (→101)
    "programmers_data_spark.queries.multimodal_ops",  # 4 (→105)
    "programmers_data_spark.queries.analytics",  # 19 (→124)
    "programmers_data_spark.queries.subqueries",  # 8 (→132)
    "programmers_data_spark.queries.accuracy_ops",  # 6 (→138)
    "programmers_data_spark.queries.sampling_ops",  # 4 (→142)
    "programmers_data_spark.queries.retrieval_ops",  # 8 (→150)
    "programmers_data_spark.queries.sketch_ops",  # 3 (→153)
    "programmers_data_spark.queries.timeseries_ops",  # 3 (→156)
    "programmers_data_spark.queries.tokenizer_ops",  # 3 (→159)
)

# ROUND-7 ROTATION PLAN (for the next session): after r6 verifies the
# 35 previously-never-checked names + bpe_contract + the r2/r3-stale
# refreshes below, the least-recently-checked tier becomes the
# remaining r3-vintage names (repetition_profile, gopher_quality_flags,
# dedup_prefix, stratified_sample, shingle_novelty,
# corpus_mixture_weights, decontam_overlap, doc_commonness,
# dedup_incremental, table_profile, curation_funnel — 11) plus the
# r4-vintage transforms/text/dedup/streaming block (48). 11+48 = 59 —
# prefer the r3 block whole, fill the rest with the oldest r4 names
# (registration order), and keep 2-3 r6-green sentinels as canaries.

# The first 50 names get_queries() yields — i.e. the names the driver
# verifies this round. Round-6 rotation (VERDICT r5 asks #1/#2/#6):
# every query that has NEVER had a driver CORRECTNESS row enters — the
# whole r5-registered retrieval/sketch/sampling/time-series tier (35
# names, incl. stream_stateful_value_stats, the dependency-free
# applyInPandasWithState twin that takes over the slot burned by the
# protobuf-gated stream_tws_value_stats in r5) — plus the new
# bpe_contract (the tokenizer tier's first hash-checkable driver row),
# with the 14 remaining slots refreshing the stalest greens: the 10
# r2-vintage similarity/multimodal names and 4 r3-vintage summary
# headliners as canaries. stream_tws_value_stats stays registered
# OUTSIDE the window (still honestly gated: google.protobuf remains
# absent in this environment and installs are disallowed).
# Everything outside the window was driver-green in r3/r4/r5 and stays
# locally verified every run by tests/test_oracle_parity.py, which
# hash-checks ALL registered oracles.
_WINDOW = (
    # retrieval tier (r5-registered, first driver rows)
    "inverted_postings",
    "bm25_topk",
    "bloom_decontam",
    "bloom_decontam_misses",
    "tfidf_shingle_pairs",
    "dedup_semantic",
    "semantic_dedup_recall",
    "embedding_sq8",
    "pq_topk",
    "pq_recall_at5",
    "ivf_recall_at5",
    "lsh_neardup_recall",
    # sketch tier (r5-registered, first driver rows)
    "mau_sketch_rollup",
    "segment_overlap_sketch",
    "cms_heavy_hitters",
    "token_heavy_hitters",
    "quantile_sketch_error",
    # sampling/split tier (r5-registered, first driver rows)
    "train_val_split",
    "token_budget_sample",
    "mixture_resample",
    "split_leakage_check",
    # time-series tier (r5-registered, first driver rows)
    "ohlc_daily",
    "scd2_intervals",
    "rolling_7d_revenue",
    "ewma_daily_revenue",
    "daily_revenue_dense",
    "mad_outliers",
    "volume_anomaly_days",
    "ingest_freshness",
    # graph/incremental/matching (r5-registered, first driver rows)
    "nation_pagerank",
    "incr_mau_refresh",
    "fuzzy_match_pairs",
    # streaming per-key state semantics — first driver row via the
    # dependency-free twin (r5 verdict ask #2)
    "stream_stateful_value_stats",
    # tokenizer tier (r5-registered rows-only + the new r6 contract)
    "bpe_merges",
    "bpe_encoded_counts",
    "bpe_contract",
    # r2-vintage refresh: similarity + multimodal (stalest greens)
    "embedding_topk",
    "embedding_neardup",
    "ann_lsh_topk",
    "ivf_topk",
    "embedding_neardup_lsh",
    "label_quality_profile",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_features",
    # r3-vintage summary canaries
    "dau",
    "channel_firstlast",
    "nps",
    "funnel_signup_purchase",
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
