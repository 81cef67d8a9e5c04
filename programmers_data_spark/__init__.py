"""programmers_data_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference repo (HyeM207/Programmers-DATA, an Airflow→Redshift ETL/ELT
course repo) as an idiomatic Spark library:

- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow).
- ``catalog``    — fixture-table loading + temp-view registration.
- ``registry``   — named query registry + DuckDB oracle SQL registry
                   (the driver contract behind ``__spark_entry__.py``).
- ``publish``    — load strategies: full refresh, incremental
                   distinct, keep-latest dedup, keyed upsert, checked
                   atomic swap (reference K1-K8).
- ``quality``    — input/output count-check runner (reference A3).
- ``functions``  — scalar transform helpers (cleaning, time, text,
                   vectors).
- ``operators``  — join/agg/window/dedup/similarity builders.
- ``streaming``  — Structured Streaming tier over the events table.
- ``multimodal`` — binary-column plumbing with stubbed decoders.
"""

__version__ = "0.1.0"
