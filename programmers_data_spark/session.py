"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same conf defaults are what we would
ship for a multi-executor cluster (AQE on, skew-join handling,
partition coalescing), with shuffle partitions sized by environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "programmers_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    Defaults chosen for 100 TB posture on a real cluster:
    - AQE enabled (runtime coalescing, skew-join splitting, dynamic
      broadcast decisions).
    - shuffle partitions explicitly sized (never the 200 default).
    - UTC session timezone so timestamp semantics match the parquet
      fixtures and any UTC-naive oracle.
    - Arrow enabled so any pandas-UDF path is vectorized.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stderr clean: the driver records only a bounded output
        # tail per bench run, and [Stage ...] progress bars crowd out
        # the JSON result line and any real warnings
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture generations vary: TIMESTAMP(NANOS) events.ts (read
        # as long, converted in catalog.load_table — no sub-µs content
        # exists) or plain TIMESTAMP(MICROS) (NTZ conf below)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # plain parquet TIMESTAMP (isAdjustedToUTC=false) scans as
        # TimestampType (UTC instant), matching DuckDB's naive-as-UTC
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
