"""Scalar transform helpers (reference §2.3), grouped by concern:

- ``cleaning`` — currency/percent/null-fill/stringify (T10-T12, T14)
- ``timeutil`` — epoch/date/format conversions (T3-T6)
- ``textfn``   — tokenization, n-grams, fingerprints, language-ID
- ``vectors``  — JVM-side embedding math (dot, cosine, norm)

Everything here is built-in-expression composition (whole-stage
codegen'd); no Python UDFs in any hot path.
"""

from . import cleaning, textfn, timeutil, vectors  # noqa: F401
