"""Fixture-table catalog: parquet scans + temp-view registration.

The driver fixtures (TESTDATA.md) are one parquet file per table.
``load_tables`` returns DataFrames straight off ``spark.read.parquet``
so Catalyst keeps predicate pushdown / column pruning; nothing is
cached here — queries decide what (if anything) to persist.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# EliminateWindowPartitions rewrites a constant-key window spec into an
# unpartitioned one, which makes WindowExec log its "No Partition
# Defined" scale warning even for windows we PROVED bounded and keyed
# by a constant on purpose (operators.bounded_global_window: per-shard
# totals, 256-row bucket offsets, per-day rollups). Excluding the rule
# keeps those intentional keys, so the warning fires only for genuinely
# unpartitioned windows — i.e. only for real mistakes. Execution is
# identical either way: one hash partition holds every row.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"
)


def _pin_excluded_rules(spark: SparkSession) -> None:
    current = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not current:
        spark.conf.set("spark.sql.optimizer.excludedRules", _EXCLUDED_RULES)
    elif _EXCLUDED_RULES not in current:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{current},{_EXCLUDED_RULES}",
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    # Runtime-settable SQL confs the driver's own session may lack:
    # UTC so date_format/to_date on fixture timestamps match the
    # UTC-naive oracle; nanosAsLong so NANOS parquet (events.ts) reads;
    # inferTimestampNTZ off so plain parquet TIMESTAMP(isAdjustedToUTC
    # =false) columns scan as TimestampType (UTC instant — identical to
    # DuckDB's naive-as-UTC reading) instead of TIMESTAMP_NTZ, which
    # unix_micros & friends reject. Setting it at the session level
    # (rather than casting post-scan) keeps parquet predicate pushdown
    # on timestamp columns.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _pin_excluded_rules(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # Fixture generations have varied their physical timestamp type:
    # earlier rounds wrote events.ts as parquet TIMESTAMP(NANOS),
    # which Spark only reads as a raw INT64 (nanosAsLong); current
    # fixtures write plain TIMESTAMP(MICROS) (handled by the NTZ conf
    # above). Both normalizations stay so any generation reads as
    # TimestampType. The nanos carried no sub-microsecond content
    # (verified across all SFs), so nanos→micros is lossless.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — a double `/` would lose precision on
        # epoch-nanos magnitudes (> 2^53) and shift timestamps by ±1µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (SQL entry point)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
