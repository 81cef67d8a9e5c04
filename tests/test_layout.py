"""Physical-layout guarantees: bucketed joins/aggs plan shuffle-free,
sorted layout prunes row groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from programmers_data_spark.catalog import load_table
from programmers_data_spark.sinks import load_bucketed, save_bucketed, write_zorder


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Final Plan ==" in plan:
        plan = plan.split("== Final Plan ==")[1].split(
            "== Initial Plan =="
        )[0]
    return plan


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmp_path, no_broadcast):
    """The headline claim: co-bucketed tables equi-join on the bucket
    key with ZERO Exchange nodes — the write-time shuffle replaces
    every query-time shuffle."""
    orders = load_table(spark, sf_smoke, "orders")
    customer = load_table(spark, sf_smoke, "customer")
    save_bucketed(
        orders, "t_orders_b", str(tmp_path / "ob"), ["o_custkey"], 4,
        sort_by=["o_custkey"],
    )
    save_bucketed(
        customer, "t_customer_b", str(tmp_path / "cb"), ["c_custkey"], 4,
        sort_by=["c_custkey"],
    )
    try:
        ob = load_bucketed(spark, "t_orders_b")
        cb = load_bucketed(spark, "t_customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = _final_plan(joined)
        assert "Exchange" not in plan, plan
        # same data as the plain-path join
        plain = (
            load_table(spark, sf_smoke, "orders")
            .join(
                load_table(spark, sf_smoke, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_agg_has_no_exchange(spark, sf_smoke, tmp_path):
    """groupBy on the bucket key aggregates within buckets — no
    exchange before the aggregate."""
    events = load_table(spark, sf_smoke, "events")
    save_bucketed(
        events, "t_events_b", str(tmp_path / "eb"), ["user_id"], 4
    )
    try:
        eb = load_bucketed(spark, "t_events_b")
        agg = eb.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        plan = _final_plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == events.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_events_b")


def test_zorder_single_column_narrows_file_ranges(spark, sf_smoke, tmp_path):
    """Range-clustered files cover (near-)disjoint key ranges: a point
    predicate's matching rows land in few files, so file/row-group
    pruning has leverage (plain hash layout spreads keys everywhere)."""
    import os

    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "ev_sorted")
    write_zorder(events, path, ["user_id"], num_files=8)

    files = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        pf = spark.read.parquet(os.path.join(path, f))
        row = pf.agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
        ).collect()[0]
        ranges.append((row.lo, row.hi))
    ranges.sort()
    # z-quantization (16-bit levels) may share a boundary value; the
    # interiors must not interleave
    overlaps = sum(
        1
        for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:])
        if lo_b < hi_a
    )
    assert overlaps == 0, ranges
    assert spark.read.parquet(path).count() == events.count()
