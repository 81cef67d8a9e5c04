"""EP3-parity: config-driven summary builds end-to-end."""

from __future__ import annotations

import pytest

from programmers_data_spark.plans import (
    ALL_CONFIGS,
    MAU_SUMMARY,
    SummaryConfig,
    build_summary_table,
)
from programmers_data_spark.quality import CountCheck, QualityCheckError


def test_all_reference_configs_build(spark, sf_smoke, tmp_path):
    for cfg in ALL_CONFIGS:
        out = build_summary_table(spark, sf_smoke, cfg, str(tmp_path))
        assert out.count() > 0, cfg.table


def test_input_check_gates_build(spark, sf_smoke, tmp_path):
    cfg = SummaryConfig(
        table="gated",
        main_sql=MAU_SUMMARY.main_sql,
        input_checks=[
            ("SELECT count(1) FROM events", CountCheck("impossible", 10**12, "ge"))
        ],
    )
    with pytest.raises(QualityCheckError):
        build_summary_table(spark, sf_smoke, cfg, str(tmp_path))


def test_rebuild_is_idempotent(spark, sf_smoke, tmp_path):
    a = build_summary_table(spark, sf_smoke, MAU_SUMMARY, str(tmp_path))
    n = a.count()
    b = build_summary_table(spark, sf_smoke, MAU_SUMMARY, str(tmp_path))
    assert b.count() == n
