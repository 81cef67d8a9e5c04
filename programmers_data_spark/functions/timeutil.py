"""Time conversions (reference T3-T6).

All expressions assume the session timezone is pinned to UTC
(catalog.load_table does this) so epoch math matches UTC-naive
fixtures and oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_seconds_to_date_str(col: Column | str) -> Column:
    """T3: epoch seconds → 'yyyy-MM-dd'
    (Weather_to_Redshift.py:38 datetime.fromtimestamp().strftime)."""
    return F.date_format(F.timestamp_seconds(_c(col)), "yyyy-MM-dd")


def format_timestamp(col: Column | str) -> Column:
    """T4: timestamp → 'yyyy-MM-dd HH:mm:ss' (UpdateSymbol.py:32)."""
    return F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss")


def month_bucket(col: Column | str) -> Column:
    """T5: TO_CHAR(ts,'YYYY-MM') (Build_Summary.py:72)."""
    return F.date_format(_c(col), "yyyy-MM")


def day_bucket(col: Column | str) -> Column:
    """T6: LEFT(created_at,10) day-grain key (nps_summary.py:5)."""
    return F.date_format(_c(col), "yyyy-MM-dd")


def ts_to_epoch_micros(col: Column | str) -> Column:
    """Exact integer timestamp surface for cross-engine comparison."""
    return F.unix_micros(_c(col))
