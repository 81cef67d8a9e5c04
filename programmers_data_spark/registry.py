"""Named query registry — the driver contract behind __spark_entry__.py.

Each query is registered under a stable name together with (usually)
a DuckDB-runnable oracle SQL string. The driver runs the Spark
callable and the oracle side-by-side at sf0.01 and compares row count,
schema, and an order-insensitive value hash; column names therefore
must match exactly between the two forms.

Queries whose semantics are not SQL-expressible (streaming state,
iterative algorithms) register without an oracle and get a weaker
rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Module order is the driver's verification order: the per-round
# CORRECTNESS check covers the first 50 registered queries. Round 4
# fronts everything needing a fresh driver row: loads + transforms
# (the four queries the regenerated NTZ fixtures broke in r3),
# text_ops (lang_id_heuristic's new oracle), dedup_ops (plan changed
# to the skew-salted band join), and round3_ops (the six round-4
# additions). summary (sentinel mau) plus the r3-green text_quality /
# curation tiers fill the remaining slots as regression canaries.
# Queries outside the window were driver-green in earlier rounds and
# stay oracle-verified locally via tests/test_oracle_parity.py, which
# checks every registered oracle.
_QUERY_MODULES = (
    "programmers_data_spark.queries.loads",  # 4  — 3 NTZ-fixed + sentinel
    "programmers_data_spark.queries.transforms",  # 7 — epoch_to_date NTZ-fixed
    "programmers_data_spark.queries.text_ops",  # 13 — lang_id newly oracled
    "programmers_data_spark.queries.dedup_ops",  # 6 — salted band join
    "programmers_data_spark.queries.round3_ops",  # 11 — new this round (→41)
    "programmers_data_spark.queries.streaming_ops",  # 9 — session_window's
    #   new oracle needs a driver row; rest are r2-green canaries (→50)
    "programmers_data_spark.queries.summary",  # r1/r3-green; mau also
    #   runs every round as the entry() smoke check
    "programmers_data_spark.queries.text_quality_ops",  # r3-green
    "programmers_data_spark.queries.curation_ops",  # r3-green
    "programmers_data_spark.queries.extras",
    "programmers_data_spark.queries.similarity_ops",
    "programmers_data_spark.queries.multimodal_ops",
    "programmers_data_spark.queries.analytics",
    "programmers_data_spark.queries.subqueries",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] (+ oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators populate the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
