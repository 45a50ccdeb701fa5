"""Gate-checked query registry.

Each ``QuerySpec`` pairs a Spark DataFrame program with a DuckDB oracle
SQL string producing byte-identical values (same column names, same
rounding, same decimal arithmetic).  The driver's correctness gate runs
both at sf=0.01 and compares row-count + schema + order-insensitive
value hash — so every aggregate is aliased identically on both sides,
money math goes through DECIMAL(18,2) (exact, engine-independent) and
only lands in DOUBLE after the final exact sum, and timestamps are
formatted to strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


def _collect_specs() -> list[QuerySpec]:
    from swisscourtrulingcorpus_spark.plans import analytics_queries
    from swisscourtrulingcorpus_spark.plans import extra_queries
    from swisscourtrulingcorpus_spark.plans import olap_queries
    from swisscourtrulingcorpus_spark.plans import relational_queries
    from swisscourtrulingcorpus_spark.plans import text_queries
    from swisscourtrulingcorpus_spark.plans import window_queries

    specs: list[QuerySpec] = []
    specs += relational_queries.SPECS
    specs += text_queries.SPECS
    specs += window_queries.SPECS
    specs += extra_queries.SPECS
    specs += analytics_queries.SPECS
    specs += olap_queries.SPECS
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


QUERY_SPECS: list[QuerySpec] = _collect_specs()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in QUERY_SPECS}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in QUERY_SPECS if s.oracle is not None}
