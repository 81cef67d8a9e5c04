"""Ingestion-transform queries (reference §2.3, T1-T13).

Each reproduces one reference row-transform on the fixtures, with the
dirty input synthesized deterministically inside the query (both
engines build the same string before cleaning it), per FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cleaning import clean_numeric, strip_currency
from ..functions.timeutil import epoch_seconds_to_date_str, format_timestamp
from ..registry import query


@query(
    "csv_parse_project",
    oracle="""
    WITH lines AS (
      SELECT c_name || ',' || c_mktsegment AS line FROM customer
    )
    SELECT string_split(line, ',')[1] AS name,
           string_split(line, ',')[2] AS segment
    FROM lines
    ORDER BY name
    """,
)
def csv_parse_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: CSV line split + 2-col projection
    (NameGenderCSVtoRedshift.py:31-39 transform())."""
    cust = load_table(spark, sf_dir, "customer")
    lines = cust.select(
        F.concat_ws(",", "c_name", "c_mktsegment").alias("line")
    )
    parts = F.split(F.col("line"), ",")
    return lines.select(
        parts.getItem(0).alias("name"), parts.getItem(1).alias("segment")
    ).orderBy("name")


@query(
    "json_nested_project",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    ORDER BY event_id
    """,
)
def json_nested_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/S3: nested JSON field extraction (UpdateCountry.py:38-50
    d["name"]["official"]; here events.props '$.k')."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    ).orderBy("event_id")


@query(
    "epoch_to_date",
    oracle="""
    SELECT event_id,
           strftime(make_timestamp((epoch_us(ts) // 1000000) * 1000000),
                    '%Y-%m-%d') AS date
    FROM events
    ORDER BY event_id
    """,
)
def epoch_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: epoch seconds → date string (Weather_to_Redshift.py:38).
    Round-trips ts through integer epoch seconds in both engines."""
    events = load_table(spark, sf_dir, "events")
    epoch_s = F.expr("unix_micros(ts) div 1000000")
    return events.select(
        "event_id", epoch_seconds_to_date_str(epoch_s).alias("date")
    ).orderBy("event_id")


@query(
    "ts_format",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    ORDER BY event_id
    """,
)
def ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: timestamp → '%Y-%m-%d %H:%M:%S' string (UpdateSymbol.py:32)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", format_timestamp("ts").alias("ts_str")
    ).orderBy("event_id")


@query(
    "daily_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
    ORDER BY event_id
    """,
)
def daily_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: incremental date predicate
    (MySQL_to_Redshift_v2.py:36 WHERE DATE(created_at) = execution_date).
    At scale this prunes date partitions instead of scanning."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.to_date("ts") == F.lit("2024-01-15"))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "clean_currency",
    oracle="""
    WITH dirty AS (
      SELECT p_partkey,
             '$' || CAST(CAST(floor(p_retailprice * 100) AS BIGINT) AS VARCHAR)
               AS price_str,
             CAST(p_size AS VARCHAR) || '%' AS pct_str
      FROM part
    )
    SELECT p_partkey,
           CAST(replace(replace(price_str, '$', ''), ',', '') AS BIGINT)
             AS price_cents,
           CAST(rtrim(pct_str, '%') AS DOUBLE) / 100 AS size_frac
    FROM dirty
    ORDER BY p_partkey
    """,
)
def clean_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10/T11: '$'/','-strip and percent→fraction
    (gsheet.py:38-39,143-144). The dirty strings are synthesized
    identically in both engines, then cleaned by the engine helpers."""
    part = load_table(spark, sf_dir, "part")
    dirty = part.select(
        "p_partkey",
        F.concat(
            F.lit("$"),
            F.floor(F.col("p_retailprice") * 100).cast("bigint").cast("string"),
        ).alias("price_str"),
        F.concat(F.col("p_size").cast("string"), F.lit("%")).alias("pct_str"),
    )
    return dirty.select(
        "p_partkey",
        strip_currency("price_str").cast("bigint").alias("price_cents"),
        clean_numeric("pct_str").alias("size_frac"),
    ).orderBy("p_partkey")


@query(
    "null_fill",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), '') AS channel
    FROM events
    ORDER BY event_id
    """,
)
def null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: fillna('') before export (gsheet.py:140), with nulls
    synthesized by nullif so the fill is observable."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_id",
            F.nullif(F.col("event_type"), F.lit("error")).alias("channel"),
        )
        .na.fill({"channel": ""})
        .orderBy("event_id")
    )
