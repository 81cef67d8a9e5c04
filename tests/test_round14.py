"""Round-14: the media curation report (modality x provenance
roll-up over the published pair stores)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
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


def test_split_leakage_grid_and_bounds(spark):
    """All four modality rows present; leak counts bounded by pair
    counts; exact integer percentages (zero-guarded)."""
    rows = registry.QUERIES["split_media_leakage"](spark, SF_DIR).collect()
    assert [r.modality for r in rows] == ["audio", "image", "text", "video"]
    for r in rows:
        assert 0 <= r.n_leaks <= r.n_pairs
        expect = 0 if r.n_pairs == 0 else r.n_leaks * 100 // r.n_pairs
        assert r.leak_pct == expect


def test_contamination_excludes_eval_docs(spark):
    """Contaminated counts only ever cover TRAINING docs (the eval
    slice itself is never reported as contaminated), and the per-
    source totals partition the non-eval corpus."""
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries.round14_ops import EVAL_SET_MOD

    rows = registry.QUERIES["eval_contamination_audit"](
        spark, SF_DIR
    ).collect()
    docs = load_table(spark, SF_DIR, "documents")
    n_train = docs.filter(F.col("doc_id") % EVAL_SET_MOD != 0).count()
    assert sum(r.n_train_docs for r in rows) == n_train
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_train_docs
        assert r.contam_pct == r.n_contaminated * 100 // r.n_train_docs


def test_new_report_oracle_parity(spark):
    for name in ("split_media_leakage", "eval_contamination_audit"):
        res = compare_to_oracle(
            name,
            registry.QUERIES[name](spark, SF_DIR),
            registry.ORACLE[name],
            SF_DIR,
        )
        assert res.ok, res


def test_threshold_sweep_is_monotone_and_anchored(spark):
    """Pair counts are monotone non-decreasing in the threshold
    direction that admits more pairs, and the loosest row equals the
    store's full pair count per modality."""
    rows = registry.QUERIES["dedup_threshold_sweep"](spark, SF_DIR).collect()
    by_mod: dict = {}
    for r in rows:
        by_mod.setdefault(r.modality, []).append((r.threshold, r.n_pairs))
    assert set(by_mod) == {"text", "audio", "image", "video"}
    for mod, cells in by_mod.items():
        cells.sort()
        counts = [n for _, n in cells]
        if mod == "text":
            # tighter jaccard admits FEWER pairs
            assert counts == sorted(counts, reverse=True), (mod, cells)
        else:
            # larger hamming radius admits MORE pairs
            assert counts == sorted(counts), (mod, cells)
        assert len(cells) == 5
    # Anchoring: the loosest cell of every modality IS the store's
    # full pair count — min(TEXT_SWEEP_BPS)/1e4 == JACCARD_THRESHOLD
    # and max(HAM_SWEEP) == HAM_T, so the loosest filter admits
    # every published pair (r14 ADVICE #3).
    from programmers_data_spark import media_index
    from programmers_data_spark.queries.dedup_ops import (
        verified_pair_store,
    )
    from programmers_data_spark.queries.media_lifecycle_ops import (
        AUDIO_SPEC,
        VIDEO_SPEC,
    )
    from programmers_data_spark.queries.round12_ops import IMAGE_SPEC

    loosest = {
        "text": min(t for t, _ in by_mod["text"]),
        "audio": max(t for t, _ in by_mod["audio"]),
        "image": max(t for t, _ in by_mod["image"]),
        "video": max(t for t, _ in by_mod["video"]),
    }
    stores = {
        "text": verified_pair_store(spark, SF_DIR).count(),
        "audio": media_index.pair_store(spark, SF_DIR, AUDIO_SPEC).count(),
        "image": media_index.pair_store(spark, SF_DIR, IMAGE_SPEC).count(),
        "video": media_index.pair_store(spark, SF_DIR, VIDEO_SPEC).count(),
    }
    for mod, cells in by_mod.items():
        got = dict(cells)[loosest[mod]]
        assert got == stores[mod], (mod, got, stores[mod])
