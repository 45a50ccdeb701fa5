#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes via .count() on the final plan (full execution, no
driver-side row transfer).  A tiny warmup query first so JVM/codegen
startup isn't billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from swisscourtrulingcorpus_spark.plans.registry import queries  # noqa: E402
from swisscourtrulingcorpus_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q18_large_orders",
    "coverage_by_region",
    "map_join_orders",
    "semi_join_membership",
    "asof_purchase_attribution",
    "topk_orders_per_segment",
    "rollup_region_nation",
    # LLM-pipeline operators
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "tfidf_top_terms",
    # event-time windows
    "tumbling_hourly_events",
    "session_windows_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    # warmup: JVM + whole-stage-codegen compile paths
    q["coverage_by_region"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        q[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
