#!/usr/bin/env python
"""Per-query py4j round-trip census (guide §1 — deterministic cost).

Wall-clock construction times on this box drift with host contention
(OPTIMIZATION_r12.md "Measurement setup"), but the NUMBER of py4j
round trips per construction is a pure function of the code, so it is
the primary before/after evidence for construction-cost changes.
Counts `ClientServerConnection.send_command` calls (classic py4j local
mode) made while constructing each headline query once, after a warmup
pass that fills the schema/view caches.

Usage: python tools/rt_census.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swisscourtrulingcorpus_spark.plans.registry import queries  # noqa: E402
from swisscourtrulingcorpus_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rt_census")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counted

    # warmup: schema/view caches
    for name in names:
        q[name](spark, sf_dir)

    out = {}
    for name in names:
        before = counter["n"]
        q[name](spark, sf_dir)
        out[name] = counter["n"] - before
    cs.ClientServerConnection.send_command = orig
    print(json.dumps({
        "per_query_round_trips": out,
        "total_per_pass": sum(out.values()),
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
