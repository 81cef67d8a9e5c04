"""Time-series tier: sliding RANGE frames, calendar densification,
and sequential smoothing over the daily revenue rollup.

The reference's summaries are all point-in-time GROUP BYs; these add
the time-axis operators reporting actually runs on top of them. All
three share the same scale shape: the FACT TABLE is touched once by
a distributed date-keyed aggregate, and the time-axis pass runs on
the bounded one-row-per-day series (thousands of rows for years of
data) — so sequential semantics like EWMA cost nothing at 100 TB.

- rolling_7d_revenue:  7-day sliding-window revenue via a RANGE
                       frame over the day ordinal (true calendar
                       window — day gaps count, unlike ROWS).
- daily_revenue_dense: calendar densification — every day in the
                       observed span gets a row, gaps filled with
                       zero (the spine join downstream interpolation
                       and window ops need).
- ewma_daily_revenue:  exponential smoothing, s_t = a*x_t +
                       (1-a)*s_{t-1} — inherently sequential, run as
                       an order-pinned fold on the bounded series so
                       both engines execute the identical IEEE
                       recursion (DuckDB: recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import bounded_global_window
from ..registry import query

EWMA_ALPHA = 0.2

# shared daily rollup: revenue per order day since 1997 (decimal sum
# → exact; cast double only at the edge)
_DUCK_DAILY = """
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01")
    )
    return (
        orders.select(
            F.to_date("o_orderdate").alias("d"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("d")
        .agg(F.sum("p").alias("rev"))
    )


@query(
    "rolling_7d_revenue",
    oracle=f"""
    WITH daily AS ({_DUCK_DAILY}),
    o AS (
      SELECT d, rev, CAST(d - DATE '1970-01-01' AS BIGINT) AS ord
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (ORDER BY ord
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rev_7d,
           CAST(COUNT(*) OVER (ORDER BY ord
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS INT)
             AS days_present_7d
    FROM o
    ORDER BY day
    """,
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True 7-calendar-day sliding revenue: a RANGE frame over the
    epoch-day ordinal, so a day after a 3-day gap sums only the days
    actually inside its window (a ROWS frame would silently reach
    back across the gap). Decimal sums keep the frame arithmetic
    exact; doubles only at the output edge.

    The window input is the bounded daily rollup (one row per day) —
    the constant-key bounded_global_window keeps WindowExec's
    no-partition warning reserved for real mistakes. At scale the
    only fact-table pass is the distributed date-keyed aggregate.
    """
    daily = _daily(spark, sf_dir).withColumn(
        "ord", F.datediff("d", F.lit("1970-01-01")).cast("long")
    )
    w = bounded_global_window("ord").rangeBetween(-6, 0)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("rev").cast("double").alias("revenue"),
            F.sum("rev").over(w).cast("double").alias("rev_7d"),
            F.count(F.lit(1)).over(w).cast("int").alias("days_present_7d"),
        )
        .orderBy("day")
    )


@query(
    "daily_revenue_dense",
    oracle=f"""
    WITH daily AS ({_DUCK_DAILY}),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    spine AS (
      SELECT CAST(g.d AS DATE) AS d
      FROM (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds
      ) g
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(dd.rev, 0) AS DOUBLE) AS revenue,
           dd.rev IS NULL AS gap_filled
    FROM spine s LEFT JOIN daily dd USING (d)
    ORDER BY day
    """,
)
def daily_revenue_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a generated date spine spanning the
    observed range, left-joined to the daily rollup with zero-fill
    and a provenance flag — the prerequisite for interpolation,
    honest ROWS windows, and chart export (a missing day must read
    as zero, not silently vanish).

    The spine is sequence() over a 1-row min/max aggregate — data
    defines the range, nothing hard-coded — exploded to one row per
    day and broadcast-joined back (days are bounded; the fact table
    was already reduced). One distributed aggregate, no second scan.
    """
    daily = _daily(spark, sf_dir)
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("rev"), F.lit(0)).cast("double").alias("revenue"),
            F.col("rev").isNull().alias("gap_filled"),
        )
        .orderBy("day")
    )


@query(
    "ewma_daily_revenue",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DUCK_DAILY}),
    o AS (
      SELECT strftime(d, '%Y-%m-%d') AS day,
             CAST(rev AS DOUBLE) AS x,
             row_number() OVER (ORDER BY d) AS rn
      FROM daily
    ),
    ew AS (
      SELECT day, x, rn, x AS s FROM o WHERE rn = 1
      UNION ALL
      SELECT o.day, o.x, o.rn,
             ({EWMA_ALPHA} * o.x) + ({1.0 - EWMA_ALPHA} * ew.s)
      FROM o JOIN ew ON o.rn = ew.rn + 1
    )
    SELECT day, x AS revenue, s AS ewma
    FROM ew
    ORDER BY day
    """,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing over the daily series: s_1 = x_1,
    s_t = a*x_t + (1-a)*s_{t-1}. Inherently sequential — so it runs
    where sequential is free: the fact table reduces to one row per
    day distributively, the bounded series folds in one
    order-pinned aggregate (array fold here, recursive CTE in the
    oracle), and both engines execute the IDENTICAL IEEE recursion
    term by term, which is what lets a smoothed float column
    hash-match exactly. The closed-form sum of powers would NOT
    (pow() differs in ulps across libms).
    """
    daily = _daily(spark, sf_dir).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("x"),
    )
    # one row: the day-ordered series, folded sequentially
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("ser")
    )
    states = series.select(
        "ser",
        F.aggregate(
            F.slice("ser", 2, 1_000_000),
            F.array(F.element_at(F.col("ser"), 1)["x"]),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    (F.lit(EWMA_ALPHA) * e["x"])
                    + (F.lit(1.0 - EWMA_ALPHA) * F.element_at(acc, -1))
                ),
            ),
        ).alias("ewmas"),
    )
    return (
        states.select(
            F.explode(F.arrays_zip("ser", "ewmas")).alias("z")
        )
        .select(
            F.col("z.ser.day").alias("day"),
            F.col("z.ser.x").alias("revenue"),
            F.col("z.ewmas").alias("ewma"),
        )
        .orderBy("day")
    )
