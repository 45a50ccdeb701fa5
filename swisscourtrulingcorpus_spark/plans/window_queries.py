"""Event-time window queries (streaming surface, batch-checkable).

Filled in with tumbling/sliding/session windows over the events table;
the Structured Streaming equivalents live in
swisscourtrulingcorpus_spark.streaming.
"""

from __future__ import annotations

from swisscourtrulingcorpus_spark.plans.registry import QuerySpec

SPECS: list[QuerySpec] = []
