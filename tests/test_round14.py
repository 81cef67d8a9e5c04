"""Round-14: the media curation report (modality x provenance
roll-up over the published pair stores)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from programmers_data_spark import registry  # noqa: E402
from programmers_data_spark.testing import compare_to_oracle  # noqa: E402
from tests.conftest import SF_ORACLE as SF_DIR  # noqa: E402

registry.load_all()


def test_report_grid_is_complete_and_zero_filled(spark):
    """Every (modality, source) cell is present — including zero
    cells — and dup_pct is the exact integer percentage."""
    rows = registry.QUERIES["media_curation_report"](spark, SF_DIR).collect()
    sources = {r.source for r in rows}
    mods = {r.modality for r in rows}
    assert mods == {"text", "image", "audio", "video"}
    assert len(rows) == len(sources) * 4
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert r.dup_pct == r.n_dup_docs * 100 // r.n_docs


def test_report_oracle_parity(spark):
    name = "media_curation_report"
    res = compare_to_oracle(
        name,
        registry.QUERIES[name](spark, SF_DIR),
        registry.ORACLE[name],
        SF_DIR,
    )
    assert res.ok, res
