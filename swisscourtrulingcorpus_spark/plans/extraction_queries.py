"""Round-3 gate queries exercising the extraction chain end-to-end.

The extraction operators (clean → section split → judgment outcome,
citation extraction, TF-IDF relevance) are pandas_udf-backed and were
previously pytest-only; these gates reduce each chain to a relational
result DuckDB can reproduce, giving the driver a hard CORRECTNESS row
for the UDF layer (VERDICT r02, next-round items #4 and #6).
"""

from __future__ import annotations

from swisscourtrulingcorpus_spark.plans.registry import QuerySpec

SPECS: list[QuerySpec] = []
