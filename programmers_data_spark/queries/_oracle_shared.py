"""Shared DuckDB-oracle SQL fragments used by several query modules.

Lives in its own module (with NO @query registrations) so that
importing a fragment does not trigger another module's registrations:
registry order is the driver's CORRECTNESS window, so a stray
cross-module import would silently reorder the window.
"""

from __future__ import annotations

# DuckDB equivalent of textfn.tokenize: non-empty whitespace tokens.
_DUCK_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"

# Zero-norm vectors have no direction: cosine against them is 0/0 and
# ANSI engines raise where IEEE engines emit NaN — unacceptable either
# way. The similarity tier therefore defines zero vectors OUT of the
# corpus on both engines (this predicate mirrors
# similarity_ops.load_vectors' filter). Operators that don't
# normalize (embedding_sq8, label_quality_profile) keep the full
# table.
_DUCK_NONZERO = (
    "list_dot_product(CAST(embedding AS DOUBLE[]),"
    " CAST(embedding AS DOUBLE[])) > 0"
)


# top-K global vocabulary for the token-distribution drift
# profiles (batch source_vocab_divergence and its streaming twin
# stream_vocab_drift); capped so the per-source comparison grid
# (sources x K) stays trivially bounded
VDIV_VOCAB_K = 150

_DUCK_VDIV = f"""
    WITH tok AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    st AS (
      SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok
    ),
    vocab AS (
      SELECT tok, CAST(SUM(c) AS BIGINT) AS ct
      FROM st GROUP BY tok
      ORDER BY SUM(c) DESC, tok
      LIMIT {{k}}
    ),
    corpus_n AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM vocab),
    src_n AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS ns
      FROM st JOIN vocab USING (tok)
      GROUP BY source
    ),
    grid AS (
      SELECT s.source, v.tok, v.ct, coalesce(st.c, 0) AS cs
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN vocab v
      LEFT JOIN st ON st.source = s.source AND st.tok = v.tok
    ),
    diffs AS (
      SELECT g.source,
             abs(CASE WHEN coalesce(sn.ns, 0) = 0 THEN 0.0
                      ELSE CAST(g.cs AS DOUBLE) / CAST(sn.ns AS DOUBLE) END
                 - CAST(g.ct AS DOUBLE) / CAST(cn.n AS DOUBLE)) AS d,
             g.tok,
             sn.ns
      FROM grid g
      LEFT JOIN src_n sn USING (source)
      CROSS JOIN corpus_n cn
    )
    SELECT source,
           CAST(coalesce(any_value(ns), 0) AS BIGINT) AS n_vocab_tokens,
           0.5 * list_reduce(list(d ORDER BY tok), (acc, x) -> acc + x)
             AS tv_divergence
    FROM diffs
    GROUP BY source
    ORDER BY source
"""
