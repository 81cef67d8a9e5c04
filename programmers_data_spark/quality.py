"""Data-quality check runner (reference A3).

The reference gates summary builds with row-count assertions before
and after the main SQL (redshift_summary.py:185-211: input checks
compare a count SQL against a minimum; output checks support an
``eq`` mode) and refuses to publish empty results
(Build_Summary.py:42-45). Same semantics here, engine-native: checks
run as Spark actions against DataFrames/views and raise
``QualityCheckError`` on violation, aborting the publish.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_OPS: dict[str, Callable[[int, int], bool]] = {
    "ge": lambda actual, want: actual >= want,
    "eq": lambda actual, want: actual == want,
    "le": lambda actual, want: actual <= want,
    "gt": lambda actual, want: actual > want,
}


class QualityCheckError(RuntimeError):
    pass


@dataclass(frozen=True)
class CountCheck:
    """count(*) assertion — the reference's only check type.

    ``sql`` is a counting query returning one row/one value (mirrors
    redshift_summary.py input_check 'sql' keys); alternatively a
    DataFrame is counted directly.
    """

    name: str
    want: int
    op: str = "ge"  # reference: min-count default, 'eq' supported

    def evaluate(self, actual: int) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unknown check op {self.op!r}")
        if not _OPS[self.op](actual, self.want):
            raise QualityCheckError(
                f"check {self.name!r} failed: count {actual} !{self.op} {self.want}"
            )


def run_sql_checks(
    spark: SparkSession, checks: list[tuple[str, CountCheck]]
) -> dict[str, int]:
    """Run (count_sql, check) pairs — reference input_check shape."""
    results = {}
    for sql, check in checks:
        actual = spark.sql(sql).collect()[0][0]
        check.evaluate(int(actual))
        results[check.name] = int(actual)
    return results


def run_df_checks(df: DataFrame, checks: list[CountCheck]) -> int:
    """Run count checks against a result DataFrame — reference
    output_check shape. A single count() action serves all checks."""
    actual = df.count()
    for check in checks:
        check.evaluate(actual)
    return actual


def assert_non_empty(df: DataFrame, context: str = "result") -> int:
    """Build_Summary.py:42-45 empty-result guard."""
    n = df.count()
    if n == 0:
        raise QualityCheckError(f"{context} produced 0 rows; refusing to publish")
    return n
