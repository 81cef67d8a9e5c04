"""Data-cleaning expressions (reference gsheet.py:38-39,64-68,107-114,
140,143-144 — T10/T11/T12/T14), as codegen-friendly Column builders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def strip_currency(col: Column | str) -> Column:
    """T10: remove '$' and ',' (gsheet.py:143-144 replace_dollar_comma)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[$,]", "")


def percent_to_fraction(col: Column | str) -> Column:
    """T11: '12%' → 0.12; non-percent strings cast straight to double
    (gsheet.py:38-39 p2f, applied conditionally :64-68)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.endswith("%"), F.regexp_replace(c, "%$", "").cast("double") / 100
    ).otherwise(c.cast("double"))


def clean_numeric(col: Column | str) -> Column:
    """T10+T11 composed: tolerate '$1,234', '45%', '7.5'."""
    return percent_to_fraction(strip_currency(col))


def fill_empty_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """T12: df.fillna('') before export (gsheet.py:140)."""
    return df.na.fill("", subset=cols)


def stringify_for_export(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """T14: cast selected (default: all) columns to string for
    sheet-like sinks (gsheet.py:107-114 type-aware stringify)."""
    targets = set(cols) if cols is not None else set(df.columns)
    return df.select(
        *[
            F.col(c).cast("string").alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
