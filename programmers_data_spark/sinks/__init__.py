"""Sink connectors and load strategies (SURVEY §2.2, K1-K11).

The table-load strategies — full refresh, incremental distinct,
keep-latest, keyed upsert, checked swap-publish — live in
``programmers_data_spark.publish`` and are re-exported here; this
module adds the file/export/notification sinks:

- K9   driver-side row export (sheet-shaped)   → ``export_rows``
- K10  file sink (CSV/parquet to a bucket path)→ ``write_csv``
- K11  failure notification callback           → ``notify_on_failure``

Scale posture: ``write_csv`` is a normal distributed write (one file
per partition; pass coalesce=1 only for genuinely small exports).
``export_rows`` hard-caps the driver collect — it exists for
sheet-sized payloads (SQL_to_Sheet.py exports a summary, not a table).
"""

from __future__ import annotations

import traceback
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..functions.cleaning import fill_empty_strings, stringify_for_export
from ..publish import (  # noqa: F401  (re-exports: the K1-K8 strategies)
    full_refresh,
    incremental_distinct,
    incremental_keep_latest,
    incremental_upsert,
    keep_latest,
    publish_swap,
    upsert,
)

__all__ = [
    "full_refresh",
    "publish_swap",
    "incremental_distinct",
    "incremental_keep_latest",
    "incremental_upsert",
    "keep_latest",
    "upsert",
    "write_csv",
    "export_rows",
    "notify_on_failure",
]


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    coalesce: int | None = None,
    **options: str,
) -> None:
    """K10: CSV file sink (plugins/s3.py:6-19 upload_to_s3 +
    Gsheet_to_Redshift.py staging). The path may be any Hadoop
    filesystem URI (s3a://, file:/); distributed write, one file per
    partition unless coalesced for a small export."""
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode("overwrite").option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def export_rows(
    df: DataFrame,
    deliver: Callable[[list[str], list[list[str]]], Any],
    max_rows: int = 100_000,
    fill_na: bool = True,
) -> int:
    """K9: export a (small) query result to an external row-based API
    (plugins/gsheet.py:102-140 update_google_sheet: clear + bulk
    values_update; driver SQL_to_Sheet.py:10-35).

    Applies the reference's export cleaning (T12 null-fill, T14
    stringify), caps the collect, and hands (header, rows) to the
    delivery callable — the seam where a real sheet/webhook client
    plugs in. Returns the number of rows delivered.
    """
    capped = df.limit(max_rows)
    if fill_na:
        capped = fill_empty_strings(stringify_for_export(capped))
    else:
        capped = stringify_for_export(capped)
    pdf = capped.toPandas()
    header = list(pdf.columns)
    rows = pdf.astype(str).values.tolist()
    deliver(header, rows)
    return len(rows)


def notify_on_failure(
    notify: Callable[[str], Any], context: str = "job"
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """K11: failure-notification decorator (plugins/slack.py:6-26
    on_failure_callback semantics). Wrap any job function; on
    exception the callback receives a message with the context and
    traceback, then the exception re-raises (the job still fails)."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        def wrapped(*args: Any, **kwargs: Any) -> Any:
            try:
                return fn(*args, **kwargs)
            except Exception as e:
                notify(
                    f"task failed: {context}: {e}\n{traceback.format_exc()}"
                )
                raise

        wrapped.__name__ = getattr(fn, "__name__", "wrapped")
        return wrapped

    return deco
