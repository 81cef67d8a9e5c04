"""The headline gate: every registered query with an oracle must
hash-match DuckDB at the correctness scale factor (mirrors the
driver's CORRECTNESS check)."""

from __future__ import annotations

import pytest

from programmers_data_spark import registry
from programmers_data_spark.testing import compare_to_oracle

registry.load_all()
_ORACLE_QUERIES = sorted(registry.ORACLE)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_oracle, name):
    if name == "stream_tws_value_stats":
        from programmers_data_spark.streaming import tws_available

        if not tws_available():
            pytest.skip("gated: google.protobuf absent (tws state protocol)")
    df = registry.QUERIES[name](spark, sf_oracle)
    result = compare_to_oracle(name, df, registry.ORACLE[name], sf_oracle)
    assert result.ok, str(result)


def test_rows_only_queries_return_rows(spark, sf_oracle):
    """Queries without an oracle still must run and return a stable schema."""
    rows_only = sorted(set(registry.QUERIES) - set(registry.ORACLE))
    for name in rows_only:
        df = registry.QUERIES[name](spark, sf_oracle)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0
