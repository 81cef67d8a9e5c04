"""Shared DuckDB-oracle SQL fragments used by several query modules.

Lives in its own module (with NO @query registrations) so that
importing a fragment does not trigger another module's registrations:
registry order is the driver's CORRECTNESS window, so a stray
cross-module import would silently reorder the window.
"""

from __future__ import annotations

# DuckDB equivalent of textfn.tokenize: non-empty whitespace tokens.
_DUCK_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"
