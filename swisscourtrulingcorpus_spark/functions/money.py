"""Exact money arithmetic shared by every oracle-gated query.

All monetary sums go through DECIMAL(18,2) (exact, engine-independent
partial aggregation) and convert to DOUBLE only after the final merge —
the single convention that makes Spark and DuckDB produce bit-identical
doubles.  Defined once so a precision change cannot drift between plan
modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def one() -> Column:
    """Exact decimal 1 (built lazily — Column construction needs an
    active SparkContext, so no module-level expressions here)."""
    return F.lit(1).cast("decimal(18,2)")


def dec2(c: Column | str) -> Column:
    """Cast to the engine-wide exact money type DECIMAL(18,2)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec2("l_extendedprice") * (one() - dec2("l_discount"))


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal."""
    return disc_price() * (one() + dec2("l_tax"))
