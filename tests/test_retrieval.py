"""Retrieval-tier invariants (retrieval_ops): posting-list caps,
BM25 ranking shape, Bloom soundness, and semantic-dedup soundness.
Oracle parity for the five oracled queries is covered (with every
other oracle) by test_oracle_parity; these tests pin the properties
the oracles can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from programmers_data_spark.catalog import load_table
from programmers_data_spark.functions.vectors import as_double_array, cosine
from programmers_data_spark.queries.retrieval_ops import (
    BLOOM_K,
    BM25_QTERMS,
    BM25_TOPK,
    POSTINGS_CAP,
    _bloom_positions,
    bloom_decontam,
    bloom_decontam_misses,
    bm25_topk,
    dedup_semantic,
    inverted_postings,
)
from programmers_data_spark.queries.similarity_ops import NEARDUP_THRESHOLD


def test_postings_capped_and_consistent(spark, sf_smoke):
    """Per-term state is bounded: never more than POSTINGS_CAP ids,
    and exactly df ids whenever df fits under the cap."""
    rows = inverted_postings(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        ids = r.postings.split(",")
        assert len(ids) <= POSTINGS_CAP
        assert len(ids) == min(r.df, POSTINGS_CAP)
        assert ids == sorted(ids, key=int)
        assert r.cf >= r.df


def test_bm25_rank_shape(spark, sf_smoke):
    rows = bm25_topk(spark, sf_smoke).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= BM25_TOPK
    assert all(1 <= r.n_terms <= BM25_QTERMS for r in rows)


def test_bloom_positions_deterministic_and_in_range(spark):
    from programmers_data_spark.queries.retrieval_ops import BLOOM_BITS

    df = spark.createDataFrame([("hello world",), ("hello world",)], ["text"])
    rows = df.select(_bloom_positions(F.col("text")).alias("pos")).collect()
    assert rows[0].pos == rows[1].pos
    assert len(rows[0].pos) == BLOOM_K
    assert all(0 <= p < BLOOM_BITS for p in rows[0].pos)


def test_bloom_never_misses_benchmark(spark, sf_smoke):
    """No false negatives: the misses query is empty, and the flagged
    count covers at least the benchmark itself (plus any exact copies
    of benchmark texts elsewhere in the corpus)."""
    assert bloom_decontam_misses(spark, sf_smoke).count() == 0
    docs = load_table(spark, sf_smoke, "documents")
    n_bench = docs.filter(F.col("doc_id") % 10 == 0).count()
    ledger = bloom_decontam(spark, sf_smoke).collect()
    assert sum(r.n_flagged for r in ledger) >= n_bench
    assert sum(r.n_flagged + r.n_kept for r in ledger) == docs.count()


def test_semantic_dedup_sound(spark, sf_smoke):
    """Soundness, re-derived independently: every dropped vector has
    an exact above-threshold neighbor with a lower id under the JVM
    cosine fold (all-pairs at smoke scale) — i.e. the Arrow cell
    assignment can only RESTRICT the exact pair set, never invent a
    drop. The globally lowest id can therefore never be dropped."""
    verdicts = dedup_semantic(spark, sf_smoke)
    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("emb")
    )
    a = emb.select(F.col("vec_id").alias("lo"), F.col("emb").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("hi"), F.col("emb").alias("emb_b"))
    exact_dropped = {
        r.hi
        for r in a.crossJoin(b)
        .filter(F.col("lo") < F.col("hi"))
        .filter(cosine("emb_a", "emb_b") >= NEARDUP_THRESHOLD)
        .select("hi")
        .distinct()
        .collect()
    }
    rows = verdicts.collect()
    dropped = {r.vec_id for r in rows if r.dropped}
    assert dropped <= exact_dropped
    assert min(r.vec_id for r in rows) not in dropped
    assert len(rows) == emb.count()


def test_sq8_roundtrip_error_bounded(spark, sf_smoke):
    """Every vector passes the inline reconstruction contract, codes
    stay in uint8 range, and the code count equals the vector dim."""
    from programmers_data_spark.queries.retrieval_ops import embedding_sq8

    rows = embedding_sq8(spark, sf_smoke).collect()
    assert rows and all(r.within_bound for r in rows)
    dims = {len(r.codes.split(",")) for r in rows}
    assert len(dims) == 1
    for r in rows[:50]:
        assert all(0 <= int(c) <= 255 for c in r.codes.split(","))


def test_rolling_window_counts_calendar_days(spark, sf_smoke):
    """RANGE frame semantics: days_present never exceeds 7, and after
    a gap the window holds fewer days than a ROWS frame would."""
    from programmers_data_spark.queries.timeseries_ops import rolling_7d_revenue

    rows = rolling_7d_revenue(spark, sf_smoke).collect()
    assert rows and all(1 <= r.days_present_7d <= 7 for r in rows)


def test_dense_spine_has_no_gaps(spark, sf_smoke):
    """Every calendar day between min and max appears exactly once,
    and filled gaps carry zero revenue."""
    import datetime as dt

    from programmers_data_spark.queries.timeseries_ops import daily_revenue_dense

    rows = daily_revenue_dense(spark, sf_smoke).collect()
    days = [dt.date.fromisoformat(r.day) for r in rows]
    assert days == sorted(days)
    assert len(days) == (days[-1] - days[0]).days + 1
    assert all(r.revenue == 0.0 for r in rows if r.gap_filled)


def test_ewma_matches_reference_recursion(spark, sf_smoke):
    """The distributed fold reproduces the plain-Python recursion."""
    from programmers_data_spark.queries.timeseries_ops import (
        EWMA_ALPHA,
        ewma_daily_revenue,
    )

    rows = ewma_daily_revenue(spark, sf_smoke).collect()
    s = rows[0].revenue
    assert rows[0].ewma == s
    for r in rows[1:]:
        s = (EWMA_ALPHA * r.revenue) + ((1.0 - EWMA_ALPHA) * s)
        assert r.ewma == s
