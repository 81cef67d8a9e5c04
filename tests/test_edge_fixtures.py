"""Fixture-regeneration insurance: every documents/embeddings oracle
pair must hash-match on ADVERSARIAL content, not just on whatever the
current driver generation happens to contain.

The driver regenerates /root/testdata between rounds; round 3's NTZ
breakage and round 4's latent empty-doc bigram divergence both came
from assumptions the fixtures used to satisfy. This suite builds a
tiny corpus of degenerate documents — empty text, whitespace-only,
single tokens, pathological repetition, unicode, tabs/newlines — and
runs the full Spark-vs-DuckDB comparison for every registered query
whose oracle reads only the documents/embeddings tables. Green here
means the text/dedup/curation tiers are invariant to whatever the
next generation contains, not accidentally correct on this one.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from programmers_data_spark import registry
from programmers_data_spark.testing import compare_to_oracle

registry.load_all()

_EDGE_DOCS = [
    (0, "", "en", "src0"),
    (1, "   ", "en", "src0"),
    (2, "word", "en", "src1"),
    (3, "two tokens", "en", "src1"),
    (4, "the the the the the the the the", "en", "src1"),
    (5, "héllo wörld ünïcode tëxt here", "de", "src2"),
    (6, "!!! ??? ,,, ... ;;; ::: ---", "en", "src2"),
    (7, "a\tb\nc d\r\ne", "en", "src2"),
    (8, "x" * 400, "en", "src2"),
    (9, " leading and trailing spaces ", "en", "src0"),
    (10, "Email me at alice@example.com or call 555-123-4567 now", "en", "src1"),
    (11, "the quick brown fox jumps over the lazy dog again and again", "en", "src1"),
    (12, "one two three four five six seven eight nine ten " * 12, "en", "src2"),
    (13, "가나다 라마바 사아자", "ko", "src0"),
    (14, "mixed CASE Words And SOME lower case filler tokens", "en", "src1"),
    (15, "the quick brown fox jumps over the lazy dog again and again", "en", "src2"),
]


def _oracle_tables(sql: str) -> set[str]:
    return {
        t
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
        if re.search(rf"\b{t}\b", sql)
    }


_DOC_ONLY = sorted(
    name
    for name, sql in registry.ORACLE.items()
    if _oracle_tables(sql) <= {"documents", "embeddings"}
    and not name.startswith("stream_")
)


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, t, lang, src in _EDGE_DOCS
        ]
    )
    docs.to_parquet(d / "documents.parquet", index=False)
    rng = np.random.default_rng(7)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(_EDGE_DOCS), dtype=np.int64),
            "embedding": [
                rng.standard_normal(64).astype(np.float32) for _ in _EDGE_DOCS
            ],
            "label": (np.arange(len(_EDGE_DOCS)) % 3).astype(np.int32),
        }
    )
    emb.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_doc_tier_queries_discovered():
    """The sweep must actually cover the text/dedup/curation tiers —
    guard against the discovery regex silently matching nothing."""
    assert len(_DOC_ONLY) >= 25, _DOC_ONLY


@pytest.mark.parametrize("name", _DOC_ONLY)
def test_oracle_parity_on_adversarial_corpus(spark, edge_sf_dir, name):
    df = registry.QUERIES[name](spark, edge_sf_dir)
    result = compare_to_oracle(
        name, df, registry.ORACLE[name], edge_sf_dir
    )
    assert result.ok, str(result)
