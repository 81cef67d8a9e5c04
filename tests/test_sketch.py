"""Mergeable-sketch tier invariants (sketch_ops). Oracle parity is
covered by test_oracle_parity; these pin the sketch-algebra claims
the docstrings make."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from programmers_data_spark.catalog import load_table
from programmers_data_spark.queries.sketch_ops import (
    mau_sketch_rollup,
    segment_overlap_sketch,
)


def test_daily_rollup_equals_direct_monthly_sketch(spark, sf_smoke):
    """HLL union is lossless: a month's estimate from merged DAILY
    sketches is bit-identical to building one sketch over the month
    directly (registers are per-key maxima, and max is associative).
    This is the property that makes the persisted daily-sketch layer
    safe — any rollup grain gives the same answer as a rescan."""
    orders = load_table(spark, sf_smoke, "orders")
    daily = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        "o_custkey",
    )
    via_days = (
        daily.groupBy("month", "day")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .groupBy("month")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    )
    merged = {r.month: r.est for r in via_days.collect()}
    built = {r.month: r.est for r in direct.collect()}
    assert merged == built


def test_sketch_contracts_hold_on_smoke(spark, sf_smoke):
    mau = mau_sketch_rollup(spark, sf_smoke).collect()
    assert mau and all(r.within_bound for r in mau)
    ov = segment_overlap_sketch(spark, sf_smoke).collect()
    assert ov and all(r.within_bound for r in ov)
    assert all(r.overlap_exact >= 0 for r in ov)


def test_stream_sketch_rollup_matches_direct(spark, sf_smoke, tmp_path):
    """Streamed-in-micro-batches sketch state reproduces the direct
    batch build bit-for-bit (HLL union associativity + idempotent
    merge), and re-processing converges to the same estimates."""
    from programmers_data_spark.streaming import (
        read_events_stream,
        stream_sketch_rollup,
    )

    path = str(tmp_path / "sketches")
    stream = read_events_stream(spark, sf_smoke)
    stream_sketch_rollup(stream, path, key_col="user_id", day_col="ts")

    stored = spark.read.parquet(path)
    merged = {
        r.day: r.est
        for r in stored.select(
            "day", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    events = load_table(spark, sf_smoke, "events")
    direct = {
        r.day: r.est
        for r in events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == direct

    # replay the whole source into the same table: estimates unchanged
    stream_sketch_rollup(
        read_events_stream(spark, sf_smoke), path,
        key_col="user_id", day_col="ts",
    )
    replayed = {
        r.day: r.est
        for r in spark.read.parquet(path)
        .select("day", F.hll_sketch_estimate("sk").alias("est"))
        .collect()
    }
    assert replayed == direct


def test_stream_cms_rollup_matches_direct_and_survives_replay(
    spark, sf_smoke, tmp_path
):
    """Streamed CMS grid == direct batch grid, and replaying the
    whole source (fresh query, same table) changes nothing: the
    in-table batch ledger makes the additive merge exactly-once."""
    from programmers_data_spark.queries.sketch_ops import CMS_DEPTH, _cms_pos
    from programmers_data_spark.streaming import (
        cms_estimate,
        read_events_stream,
        stream_cms_rollup,
    )

    path = str(tmp_path / "cms")
    # un-checkpointed runs must refuse: batch-id ledger soundness
    # depends on the engine resuming ids from a checkpoint (r5 advice)
    with pytest.raises(ValueError, match="checkpointLocation"):
        stream_cms_rollup(read_events_stream(spark, sf_smoke), path)
    stream_cms_rollup(
        read_events_stream(spark, sf_smoke),
        path,
        checkpoint=str(tmp_path / "cp1"),
    )

    def grid(df):
        return {
            (r.row, r.pos): r.cell
            for r in df.collect()
        }

    stored = grid(
        spark.read.parquet(path)
        .filter(F.col("kind") == "cell")
        .select("row", "pos", "cell")
    )
    events = load_table(spark, sf_smoke, "events")
    direct = grid(
        events.select(F.col("user_id").cast("string").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "c",
            F.posexplode(
                F.array(*[_cms_pos(F.col("term"), s) for s in range(CMS_DEPTH)])
            ).alias("row", "pos"),
        )
        .groupBy("row", "pos")
        .agg(F.sum("c").alias("cell"))
    )
    assert stored == direct

    # redelivery of byte-identical batches (fresh checkpoint restarts
    # ids at 0 over the SAME source): ledger skips every batch, grid
    # unchanged — the one scenario unsafe_no_checkpoint covers
    stream_cms_rollup(
        read_events_stream(spark, sf_smoke), path, unsafe_no_checkpoint=True
    )
    replayed = grid(
        spark.read.parquet(path)
        .filter(F.col("kind") == "cell")
        .select("row", "pos", "cell")
    )
    assert replayed == direct

    # estimates never underestimate the true counts
    truth = {
        r.term: r.c
        for r in events.select(
            F.col("user_id").cast("string").alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(10)
        .collect()
    }
    est = {
        r.term: r.est
        for r in cms_estimate(spark, path, list(truth)).collect()
    }
    assert all(est[t] >= c for t, c in truth.items())
