"""Query plans — the "queries" of the system (SURVEY.md §2.9 analogues).

``registry`` holds every gate-checked query: a Spark DataFrame program
plus (where SQL-expressible) a DuckDB oracle producing identical values.
``__spark_entry__.py`` at the repo root re-exports them for the driver.
"""

from swisscourtrulingcorpus_spark.plans.registry import (  # noqa: F401
    QUERY_SPECS,
    QuerySpec,
    queries,
    oracle_sql,
)
