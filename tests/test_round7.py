"""Round-7 additions: the memo-cache contract made enforceable
(VERDICT r6 ask #6 + ADVICE r6 items 1-3)."""

from __future__ import annotations

import importlib
import pkgutil

import pytest

import programmers_data_spark as pkg
from programmers_data_spark import registry
from programmers_data_spark.memo import clear_memo_caches

registry.load_all()


def _all_package_modules():
    """Every importable module in the package source tree — from disk,
    not sys.modules, so a cache in a module nothing has imported yet
    still gets checked."""
    mods = [pkg]
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            mods.append(importlib.import_module(info.name))
        except ImportError:
            # honestly dep-gated modules (optional codec/client seams)
            continue
    return mods


def test_every_memo_cache_is_swept():
    """The contract: every shared-helper memo is a module-level dict
    named *_CACHE, and bench.py's per-query _reset (via
    clear_memo_caches) empties ALL of them. A cache that escapes the
    sweep gives its consumers a free ride in the bench."""
    caches = []
    for mod in _all_package_modules():
        for attr in dir(mod):
            obj = getattr(mod, attr)
            if attr.endswith("_CACHE") and isinstance(obj, dict):
                caches.append((mod.__name__, attr, obj))
    # the known fleet as of round 7 — update when adding a cache
    assert len(caches) >= 9, [f"{m}.{a}" for m, a, _ in caches]
    for _, _, c in caches:
        c["__sentinel__"] = object()
    cleared = clear_memo_caches()
    assert cleared >= len(caches)
    leaked = [f"{m}.{a}" for m, a, c in caches if c]
    assert not leaked, f"caches not reached by the sweep: {leaked}"


def test_bench_reset_uses_the_shared_sweep():
    """bench.py must clear memos through memo.clear_memo_caches, not a
    private copy that could drift from the tested contract."""
    import inspect
    import bench

    src = inspect.getsource(bench._reset)
    assert "clear_memo_caches" in src


def test_token_budget_sample_memoizes_persist(spark, sf_oracle):
    """ADVICE r6 item 1: repeated calls must reuse ONE persisted
    tokenized projection instead of stacking a new persist per call."""
    from programmers_data_spark.queries import sampling_ops

    sampling_ops._TOKDOCS_CACHE.clear()
    sampling_ops.token_budget_sample(spark, sf_oracle)
    assert len(sampling_ops._TOKDOCS_CACHE) == 1
    (cached,) = sampling_ops._TOKDOCS_CACHE.values()
    sampling_ops.token_budget_sample(spark, sf_oracle)
    assert len(sampling_ops._TOKDOCS_CACHE) == 1
    (cached2,) = sampling_ops._TOKDOCS_CACHE.values()
    assert cached2 is cached
    cached.unpersist()
    sampling_ops._TOKDOCS_CACHE.clear()


def test_bpe_contract_rejects_degenerate_merge_table(
    spark, sf_oracle, monkeypatch
):
    """ADVICE r6 item 2: a trainer that exhausts the pair space early
    must raise a descriptive error, not IndexError or a spurious
    hash-mismatch against the oracle's pinned n_merges."""
    from programmers_data_spark.queries import tokenizer_ops

    monkeypatch.setattr(
        tokenizer_ops, "_learn_from_corpus", lambda *a, **k: []
    )
    with pytest.raises(ValueError, match="degenerate"):
        tokenizer_ops.bpe_contract(spark, sf_oracle)
