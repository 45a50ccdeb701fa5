"""F10/F12 file-number handling.

- ``normalize_file_number``: the reference's cleanup before matching
  (`dataset_creator.py:568-580`): strip braces/quotes/parens, spaces →
  underscores.
- ``parse_bge_file_number``: `bge_file_number_long` → (year, chamber,
  short number) with the reference's +1874 year offset
  (`criticality_dataset_creator.py:93-101`: BGE volume 1 ≙ 1875).

Both are pure column expressions (codegen, pushdown-safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BGE_YEAR_OFFSET = 1874


def normalize_file_number(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[{}()\"']", "")
    c = F.regexp_replace(F.trim(c), r"\s+", "_")
    return c


def parse_bge_file_number(col: Column | str) -> Column:
    """'BGE-145-IV-154' (or underscore-separated) → struct<year:int
    (calendar year = volume + 1874), volume_roman:string, page:int>.

    ``try_element_at``: malformed inputs yield null fields instead of
    failing the job — one bad row must never kill a 100 TB scan."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.regexp_replace(c, "_", "-"), "-")
    vol = F.try_element_at(parts, F.lit(2)).cast("int")
    return F.struct(
        (vol + F.lit(BGE_YEAR_OFFSET)).alias("year"),
        F.try_element_at(parts, F.lit(3)).alias("volume_roman"),
        F.try_element_at(parts, F.lit(4)).cast("int").alias("page"),
    )
