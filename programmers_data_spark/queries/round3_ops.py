"""Round-3 query additions.

Registered directly after the rotated round-2 tier so every query in
this module lands inside the driver's 50-query CORRECTNESS window.
"""

from __future__ import annotations
