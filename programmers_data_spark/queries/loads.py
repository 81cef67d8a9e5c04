"""Load-strategy queries (reference K5/K6/K7 + A4) in driver-checkable
form.

Each query splits the events table into deterministic "old"/"new"
snapshots (event_id modulo — FIXTURES.md), applies the publish-layer
operator, and returns the resulting table state so the DuckDB oracle
can recompute it in SQL. Timestamps are surfaced as epoch
microseconds (unix_micros / epoch_us) — integer-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..publish import distinct_union, keep_latest, upsert
from ..registry import query

_EVENT_COLS = (
    "event_id",
    "user_id",
    "event_type",
    "value",
)


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        *_EVENT_COLS, F.unix_micros("ts").alias("ts_us")
    )


_ORACLE_EVENTS_US = """
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
  FROM events
"""


@query(
    "incr_distinct",
    oracle=f"""
    WITH ev AS ({_ORACLE_EVENTS_US}),
    old AS (SELECT * FROM ev WHERE event_id % 3 != 2),
    new AS (SELECT * FROM ev WHERE event_id % 2 = 0)
    SELECT DISTINCT * FROM (SELECT * FROM old UNION ALL SELECT * FROM new)
    """,
)
def incr_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: temp-table union + SELECT DISTINCT * (UpdateSymbol_v2.py:69-78).

    Old snapshot = 2/3 of events, new batch = 1/2 (overlapping), so
    the distinct actually collapses duplicates.
    """
    ev = _events_us(spark, sf_dir)
    old = ev.filter(F.col("event_id") % 3 != 2)
    new = ev.filter(F.col("event_id") % 2 == 0)
    return distinct_union(old, new)


@query(
    "dedup_keep_latest",
    oracle=f"""
    WITH ev AS (
      SELECT *, strftime(ts, '%Y-%m-%d') AS date FROM ({_ORACLE_EVENTS_US.replace("epoch_us(ts) AS ts_us", "epoch_us(ts) AS ts_us, ts")})
    )
    SELECT user_id, date, event_id, event_type, value, ts_us
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, date ORDER BY ts_us DESC, event_id DESC
      ) AS seq
      FROM ev
    )
    WHERE seq = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6/W1: keep the latest event per (user_id, day) —
    ROW_NUMBER ... DESC, seq=1 (UpdateSymbol_v3.py:77-83). event_id
    breaks timestamp ties deterministically.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("date"),
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    return keep_latest(ev, ["user_id", "date"], "ts_us", tie_break="event_id")


@query(
    "upsert_keyed",
    oracle=f"""
    WITH ev AS ({_ORACLE_EVENTS_US}),
    target AS (SELECT * FROM ev WHERE event_id % 10 < 8),
    source AS (
      SELECT event_id, user_id, 'updated' AS event_type, value * 2 AS value, ts_us
      FROM ev WHERE event_id % 10 >= 5
    ),
    unioned AS (
      SELECT *, 1 AS pri FROM source
      UNION ALL
      SELECT *, 2 AS pri FROM target
    )
    SELECT event_id, user_id, event_type, value, ts_us
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY pri) AS rn
      FROM unioned
    )
    WHERE rn = 1
    """,
)
def upsert_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: keyed upsert — source rows replace target rows on
    event_id, unmatched target rows survive
    (MySQL_to_Redshift_v2.py:51-63). value*2 is exact in binary fp,
    so both engines agree bitwise.
    """
    ev = _events_us(spark, sf_dir)
    target = ev.filter(F.col("event_id") % 10 < 8)
    source = ev.filter(F.col("event_id") % 10 >= 5).select(
        "event_id",
        "user_id",
        F.lit("updated").alias("event_type"),
        (F.col("value") * 2).alias("value"),
        "ts_us",
    )
    return upsert(target, source, ["event_id"])


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: SELECT DISTINCT projection (channel_summary.py:5)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


@query(
    "scd2_intervals",
    oracle="""
    SELECT user_id, event_id, event_type, value, valid_from_us,
           valid_to_us,
           valid_to_us IS NULL AS is_current
    FROM (
      SELECT user_id, event_id, event_type, value,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS valid_to_us
      FROM events
    )
    ORDER BY user_id, valid_from_us, event_id
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each event is a version of its
    user's state; versions carry [valid_from, valid_to) validity
    intervals with the latest version open-ended (is_current). The
    keep-history dual of the reference's keep-latest dedup (K6,
    UpdateSymbol_v3.py:77-83 keeps ONLY seq=1 per key; SCD2 keeps
    every version and makes the as-of lookup an interval predicate) —
    the standard warehouse shape for auditable dimensions.

    One lead() window per key partition — hash-partitioned on
    user_id, so the history build parallelizes like any keyed
    shuffle at 100 TB; ties on ts are ordered by the unique event_id
    on both sides, and validity bounds are integer epoch-micros
    (order-insensitive, engine-exact)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    versions = _events_us(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )
    return versions.select(
        "*", F.col("valid_to_us").isNull().alias("is_current")
    ).orderBy("user_id", "valid_from_us", "event_id")


@query(
    "incr_mau_refresh",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(DISTINCT o_custkey) AS mau
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def incr_mau_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental summary-view maintenance: the published monthly MAU
    table is refreshed after a late-arriving delta by recomputing ONLY
    the months the delta touches and keeping every other month's
    published row untouched — the partition-scoped refresh the
    reference's daily full rebuild (Build_Summary.py:38-55 re-CTASes
    the whole summary every run) grows into once the fact table
    outlives full scans. COUNT(DISTINCT) does not merge across
    batches, so correct incremental maintenance must re-aggregate the
    affected months from the fact table — exactly what this does,
    scoped by a broadcast semi-join on the (tiny) affected-month set.

    The delta is the latest month present (a 1-row broadcast max —
    the late-arriving-recent-data shape), so the refresh recomputes 1
    of ~80 months and carries every other month forward untouched.
    The oracle is the FULL rebuild over all orders — split-
    independent, so the hash match proves incremental refresh ≡ full
    recompute for ANY fixture generation: the invariant that makes
    the strategy safe to adopt.

    Scale: with the fact table date-partitioned, the affected-month
    semi-join is partition pruning — the refresh reads only the
    touched months; unaffected published rows never rescan their
    source."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_custkey").alias("user_id"),
    )
    latest = orders.agg(F.max("month").alias("month"))
    old = orders.join(F.broadcast(latest), "month", "anti")
    delta = orders.join(F.broadcast(latest), "month", "semi")

    def mau(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.countDistinct("user_id").alias("mau")
        )

    published = mau(old)  # the stored summary before the delta lands
    affected = delta.select("month").distinct()
    recomputed = mau(
        orders.join(F.broadcast(affected), "month", "semi")
    )
    kept = published.join(F.broadcast(affected), "month", "anti")
    return kept.unionByName(recomputed).orderBy("month")
