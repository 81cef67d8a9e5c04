"""Semantic tests for the round-4 operators (queries/round3_ops.py).

Value-level cross-engine parity is covered for every one of these by
tests/test_oracle_parity.py (they all register oracles); these tests
pin the semantics the hashes alone don't explain — packing
invariants, sketch accuracy, vote shape — and the scale-posture plan
properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from programmers_data_spark import registry
from programmers_data_spark.queries.round3_ops import (
    KNN_K,
    KNN_QUERIES,
    SEQ_LEN,
    TOP_KEYS,
)


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_sequence_packing_invariants(spark, sf_smoke):
    """Concat-and-split semantics: offsets stay inside the bin, the
    cumulative stream is gapless (next cum = prev cum + prev tokens),
    and bins are filled in doc_id order."""
    rows = registry.QUERIES["sequence_packing"](spark, sf_smoke).collect()
    assert rows, "packing output must be non-empty"
    cum = 0
    for r in rows:  # already ordered by doc_id
        assert 0 <= r.bin_offset < SEQ_LEN
        assert r.bin_id == cum // SEQ_LEN
        assert r.bin_offset == cum % SEQ_LEN
        cum += r.n_tokens
    total_bins = rows[-1].bin_id + 1
    assert total_bins == (cum + SEQ_LEN - 1) // SEQ_LEN or total_bins == cum // SEQ_LEN + 1


def test_sequence_packing_distributed_prefix_plan(spark, sf_smoke):
    """The corpus-wide window runs per-shard (partitioned), never over
    the whole corpus in one task: every Window node in the plan that
    sorts the full doc stream must carry the shard partition key."""
    df = registry.QUERIES["sequence_packing"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only acceptable unpartitioned window input is the per-shard
    # totals table (corpus/PACK_SHARD rows) — it aggregates before the
    # window, so no full-corpus "Window [...] []" may appear after a
    # plain scan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[\]", plan):
        ctx = plan[m.start() : m.start() + 400]
        assert "shard_tokens" in ctx or "sum(n_tokens)" in ctx, (
            "unpartitioned window over non-aggregated input:\n" + ctx
        )


def test_packing_spans_reconstruct_docs_and_fill_bins(spark, sf_smoke):
    """Fragment-table invariants: per-doc span lengths sum to the
    doc's token count, fragments are contiguous from 0, and every bin
    except the last carries exactly SEQ_LEN tokens."""
    spans = registry.QUERIES["packing_spans"](spark, sf_smoke).collect()
    packed = registry.QUERIES["sequence_packing"](spark, sf_smoke).collect()
    n_tok = {r.doc_id: r.n_tokens for r in packed}
    per_doc: dict[int, list] = {}
    per_bin: dict[int, int] = {}
    for r in spans:
        per_doc.setdefault(r.doc_id, []).append((r.start_in_doc, r.n_in_bin))
        per_bin[r.bin_id] = per_bin.get(r.bin_id, 0) + r.n_in_bin
    for doc_id, frags in per_doc.items():
        frags.sort()
        assert frags[0][0] == 0
        pos = 0
        for start, n in frags:
            assert start == pos and n > 0
            pos += n
        assert pos == n_tok[doc_id]
    last_bin = max(per_bin)
    for b, filled in per_bin.items():
        assert filled == SEQ_LEN or b == last_bin, (b, filled)


def test_minhash_estimate_sketch_accuracy(spark, sf_smoke):
    """The 8-hash estimator tracks exact Jaccard on real candidate
    pairs: mean absolute error bounded (8 hashes → stderr ≈ 0.17),
    and both columns stay in [0, 1]."""
    rows = registry.QUERIES["minhash_jaccard_estimate"](
        spark, sf_smoke
    ).collect()
    assert rows, "banding must produce candidate pairs on the augmented corpus"
    errs = []
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.jaccard <= 1.0
        errs.append(abs(r.est_jaccard - r.jaccard))
    assert sum(errs) / len(errs) < 0.25


def test_knn_label_vote_shape(spark, sf_smoke):
    rows = registry.QUERIES["knn_label_vote"](spark, sf_smoke).collect()
    assert len(rows) == KNN_QUERIES
    for r in rows:
        assert 1 <= r.n_votes <= KNN_K
        assert r.predicted_label is not None


def test_skew_profile_orders_heavy_hitters(spark, sf_smoke):
    rows = registry.QUERIES["skew_profile"](spark, sf_smoke).collect()
    assert len(rows) == TOP_KEYS
    counts = [r.n_events for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(r.share for r in rows) <= 1.0 + 1e-9


def test_doc_lang_mix_shares_sum_to_one(spark, sf_smoke):
    rows = registry.QUERIES["doc_lang_mix"](spark, sf_smoke).collect()
    by_source: dict[str, float] = {}
    for r in rows:
        by_source[r.source] = by_source.get(r.source, 0.0) + r.share
    assert by_source, "at least one source"
    for total in by_source.values():
        assert abs(total - 1.0) < 1e-9


def test_adaptive_quality_gate_quartile(spark, sf_smoke):
    """The gate keeps roughly the top three quartiles: kept fraction
    ≥ 0.70 (ties at the threshold keep extra docs, never fewer), and
    every kept/dropped flag is consistent with the one threshold."""
    rows = registry.QUERIES["adaptive_quality_gate"](spark, sf_smoke).collect()
    assert rows
    thr = rows[0].threshold
    kept = sum(r.kept for r in rows)
    assert kept / len(rows) >= 0.70
    for r in rows:
        assert r.threshold == thr
        assert r.kept == int(r.score >= thr)


def test_near_dup_rate_by_source_bounds(spark, sf_smoke):
    rows = registry.QUERIES["near_dup_rate_by_source"](spark, sf_smoke).collect()
    assert rows
    assert any(r.n_dup_docs > 0 for r in rows), "augmented corpus has dups"
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert abs(r.dup_rate - r.n_dup_docs / r.n_docs) < 1e-12


def test_bigram_stats_deterministic_topk(spark, sf_smoke):
    df = registry.QUERIES["bigram_stats"](spark, sf_smoke)
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r) for r in df.collect()]
    assert a == b
    dfs = [r[2] for r in a]
    assert dfs == sorted(dfs, reverse=True)


def test_tws_stateful_op_gated_or_works(spark, sf_smoke):
    """transformWithStateInPandas (Spark 4 arbitrary-state v2): where
    protobuf exists the per-user stats equal the batch GROUP BY; here
    it raises the honest gate and the query stays unregistered."""
    from pyspark.sql import functions as F

    from programmers_data_spark import streaming
    from programmers_data_spark.streaming import (
        read_events_stream,
        run_stream_to_table,
        stateful_value_stats,
    )

    stream = read_events_stream(spark, sf_smoke)
    # r5: registration is unconditional (pinned driver window); the
    # gate moved to call time so an env without protobuf yields an
    # explicit GATED error row instead of silent absence.
    assert "stream_tws_value_stats" in registry.QUERIES
    if not streaming.tws_available():
        with pytest.raises(NotImplementedError, match="GATED.*protobuf"):
            stateful_value_stats(stream)
        with pytest.raises(NotImplementedError, match="GATED.*protobuf"):
            registry.QUERIES["stream_tws_value_stats"](spark, sf_smoke)
        return
    out = run_stream_to_table(
        stateful_value_stats(stream), output_mode="update"
    )
    from programmers_data_spark.catalog import load_table

    batch = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias(
                "total_cents"
            ),
        )
    )
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_round4_plan_postures(spark, sf_smoke):
    """Scale-posture plan guards for the round-4 additions: the
    adaptive gate's threshold rides a 1-row broadcast (no hash
    shuffle anywhere — the query is two map passes), the kNN scoring
    runs as one Arrow pass over the corpus scan (fold_cos_scores —
    no BNLJ crossJoin, r17), and the top-k queries plan TakeOrdered,
    not global sorts."""

    def plan(name):
        df = registry.QUERIES[name](spark, sf_smoke)
        return df._jdf.queryExecution().executedPlan().toString()

    gate = plan("adaptive_quality_gate")
    assert "BroadcastNestedLoopJoin" in gate
    assert gate.count("Exchange hashpartitioning") == 0

    knn = plan("knn_label_vote")
    assert "MapInPandas" in knn
    assert "BroadcastNestedLoopJoin" not in knn

    for name in ("skew_profile", "bigram_stats"):
        assert "TakeOrderedAndProject" in plan(name), name


def test_corpus_shuffle_is_permutation_and_distributed(spark, sf_smoke):
    """Deterministic shuffle: output is a bijection onto 0..N-1,
    stable across runs, and the corpus-wide rank never runs through a
    single-partition window — only the 256-row bucket-count prefix
    does."""
    df = registry.QUERIES["corpus_shuffle"](spark, sf_smoke)
    rows = df.collect()
    assert sorted(r.shuffle_pos for r in rows) == list(range(len(rows)))
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in rows]

    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[\]", plan):
        ctx = plan[m.start() : m.start() + 400]
        assert "cnt" in ctx or "count(1)" in ctx, (
            "unpartitioned window over non-aggregated input:\n" + ctx
        )
