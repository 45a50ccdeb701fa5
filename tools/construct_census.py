#!/usr/bin/env python
"""Construction-cost census over the headline queries (guide §1).

The bench times construct+execute; r11 showed driver-side plan
CONSTRUCTION (py4j round trips) is a large share of small-SF latency.
This tool times ONLY construction — `q[name](spark, sf_dir)` with no
action — N times per query after a warmup pass, and prints per-query
best/median milliseconds plus the total per bench pass (each headline
query constructs 3x per bench run).

Usage: python tools/construct_census.py [N] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swisscourtrulingcorpus_spark.plans.registry import queries  # noqa: E402
from swisscourtrulingcorpus_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="construct_census")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    # warmup: populate schema/view caches, JIT the py4j path
    for name in names:
        q[name](spark, sf_dir)

    out = {}
    for name in names:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            q[name](spark, sf_dir)
            runs.append((time.perf_counter() - t0) * 1000)
        runs.sort()
        out[name] = {
            "best_ms": round(runs[0], 1),
            "median_ms": round(runs[len(runs) // 2], 1),
        }
    total_best = sum(v["best_ms"] for v in out.values())
    print(json.dumps({
        "per_query_ms": out,
        "total_best_ms_per_pass": round(total_best, 1),
        "total_best_ms_per_bench_run_x3": round(3 * total_best, 1),
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
