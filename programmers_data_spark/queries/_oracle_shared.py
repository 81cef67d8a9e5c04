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
