"""EP3-parity summary queries: MAU, first/last-channel attribution, NPS.

Reference semantics (cited file:line in /root/reference):
- mau:   month bucket + COUNT(DISTINCT user)  — airflow/dags/config/mau_summary.py:4-10,
         airflow/dags/Build_Summary.py:71-77
- channel_firstlast: FIRST_VALUE/LAST_VALUE over full frame + DISTINCT
         — airflow/dags/config/channel_summary.py:4-11
- nps:   per-day ROUND(SUM(CASE..)::float*100/COUNT(1),2)
         — airflow/dags/config/nps_summary.py:4-11

Mapped onto the driver fixtures per FIXTURES.md: the monthly MAU runs
on orders (o_orderdate spans ~80 months); the daily-active variant on
events; channel/nps run on events (event_type≈channel, value≈score).

Scale posture: countDistinct shuffles once on (group, user) for the
partial-distinct then once on group — Spark's expand+two-phase plan
handles 100 TB provided shuffle partitions are sized; for approximate
dashboards `approx_count_distinct` is the documented big-data variant
(not used here because the oracle requires exact counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import query


@query(
    "mau",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(DISTINCT o_custkey) AS mau
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly active users: A1+T5 (mau_summary.py:4-10)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_custkey")
        .groupBy("month")
        .agg(F.countDistinct("o_custkey").alias("mau"))
        .orderBy("month")
    )


@query(
    "dau",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           count(DISTINCT user_id) AS dau
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users on the events stream table (same A1 shape
    at day grain — Build_Summary.py:71-77)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("date"), "user_id")
        .groupBy("date")
        .agg(F.countDistinct("user_id").alias("dau"))
        .orderBy("date")
    )


@query(
    "channel_firstlast",
    oracle="""
    SELECT DISTINCT
      user_id,
      first_value(event_type) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS first_channel,
      last_value(event_type) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS last_channel
    FROM events
    ORDER BY user_id
    """,
)
def channel_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last touch attribution: W2+J2+A4 (channel_summary.py:4-11).

    The explicit full frame matches the reference's ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING; event_id breaks ts
    ties so first/last are deterministic (SURVEY §7 gotcha).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            F.first("event_type").over(w).alias("first_channel"),
            F.last("event_type").over(w).alias("last_channel"),
        )
        .distinct()
        .orderBy("user_id")
    )


@query(
    "nps",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           floor(
             sum(CASE WHEN value >= 90 THEN 1 WHEN value <= 60 THEN -1 ELSE 0 END)
               * 100.0 / count(1) * 100 + 0.5
           ) / 100 AS nps
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def nps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily NPS: T6-T9+A2+O1 (nps_summary.py:4-11).

    events.value spans ~0-200, so promoter/detractor thresholds are
    scaled (>=90 promoter, <=60 detractor) to keep all three buckets
    populated. The CASE carries ELSE 0 so the SUM is an exact integer,
    and rounding to 2 decimals is spelled floor(x*100+0.5)/100 in both
    engines: Spark ROUND is HALF_UP while DuckDB's is half-even, so a
    shared explicit formulation is the only bit-stable choice
    (SURVEY §7 rounding gotcha).
    """
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") >= 90, 1).when(F.col("value") <= 60, -1).otherwise(0)
    )
    score = F.sum("b") * 100.0 / F.count(F.lit(1))
    return (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("date"), bucket.alias("b"))
        .groupBy("date")
        .agg((F.floor(score * 100 + 0.5) / 100).alias("nps"))
        .orderBy("date")
    )


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'signup') AS first_signup,
             min(ts) FILTER (event_type = 'purchase') AS first_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT strftime(first_signup, '%Y-%m-%d') AS signup_day,
           count(*) AS n_signed_up,
           count(*) FILTER (first_purchase >= first_signup) AS n_converted
    FROM firsts
    WHERE first_signup IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per-user first signup and first
    purchase via conditional MIN aggregates (one shuffle on user_id —
    no self-join, no window), then conversion counts by signup day.
    The behavioral-analytics shape next to mau/nps/channel_firstlast
    (same events table the reference's summaries roll up)."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return (
        firsts.filter(F.col("first_signup").isNotNull())
        .groupBy(
            F.date_format("first_signup", "yyyy-MM-dd").alias("signup_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_signed_up"),
            F.count(
                F.when(
                    F.col("first_purchase") >= F.col("first_signup"), F.lit(1)
                )
            ).alias("n_converted"),
        )
        .orderBy("signup_day")
    )
