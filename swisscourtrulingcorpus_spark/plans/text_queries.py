"""Text-analysis / dedup / similarity queries (LLM-pipeline operators).

Filled in after the relational batch; see operators.dedup,
operators.similarity, functions.text.
"""

from __future__ import annotations

from swisscourtrulingcorpus_spark.plans.registry import QuerySpec

SPECS: list[QuerySpec] = []
