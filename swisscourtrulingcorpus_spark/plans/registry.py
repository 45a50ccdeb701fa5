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


# The driver's correctness gate evaluates only the FIRST 50 registry
# entries each round.  Rounds 2–4 managed that window with a manually
# curated promotion list; round 5 (VERDICT r04 item 1) replaces it with
# a self-rotating STALENESS ordering: specs are sorted by the round of
# their last VERIFIED driver row (ascending; never-verified first as
# round -1, ties broken by declaration order).  Each round the driver
# therefore re-checks exactly the 50 queries whose evidence is oldest —
# new gates (never checked) automatically enter the window, and no
# gate's driver row can silently age out: with a 50-entry window the
# steady-state max staleness is ceil(n_specs/50) rounds (5 at the
# current 230+ specs).  Because that staleness grows with the registry,
# every round additionally commits a FULL-registry sweep artifact
# (SWEEP_r{N}.json, written by `python tools/driver_sim.py --sweep`)
# so the driver-facing evidence for gates outside the window is a
# committed per-round artifact, not just a transient test run
# (VERDICT r06 "what's wrong" #3).  tests/test_registry_window.py
# asserts the ordering invariant and the sweep's existence/coverage
# mechanically.


def last_verified_round(repo_root: str | None = None) -> dict[str, int]:
    """name -> highest round number with a VERIFIED driver row: a
    CORRECTNESS_r*.json entry whose ``err`` is null AND whose value
    hash matched.  Rows that errored (uuid5_document_ids' r01–r03
    ``no_oracle`` rows) and rows that ran but came back RED
    (hash_match false — r03 had four) do not count, so a broken or
    never-value-checked gate stays at the FRONT of the window and gets
    re-checked the round after its fix instead of rotating to the back
    as freshly-checked (ADVICE r04 + r05 review)."""
    import glob
    import json
    import os
    import re

    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("hash_match") is True
            ):
                last[name] = max(last.get(name, -1), rnd)
    return last


def _collect_specs() -> list[QuerySpec]:
    from swisscourtrulingcorpus_spark.plans import analytics_queries
    from swisscourtrulingcorpus_spark.plans import ann_queries
    from swisscourtrulingcorpus_spark.plans import behavior_queries
    from swisscourtrulingcorpus_spark.plans import curation_queries
    from swisscourtrulingcorpus_spark.plans import extra_queries
    from swisscourtrulingcorpus_spark.plans import layout_queries
    from swisscourtrulingcorpus_spark.plans import retrieval_queries
    from swisscourtrulingcorpus_spark.plans import annotation_queries
    from swisscourtrulingcorpus_spark.plans import extraction_queries
    from swisscourtrulingcorpus_spark.plans import olap_queries
    from swisscourtrulingcorpus_spark.plans import olap_queries2
    from swisscourtrulingcorpus_spark.plans import training_queries
    from swisscourtrulingcorpus_spark.plans import relational_queries
    from swisscourtrulingcorpus_spark.plans import sketch_queries
    from swisscourtrulingcorpus_spark.plans import drift_queries
    from swisscourtrulingcorpus_spark.plans import text_queries
    from swisscourtrulingcorpus_spark.plans import window_queries

    specs: list[QuerySpec] = []
    specs += relational_queries.SPECS
    specs += text_queries.SPECS
    specs += window_queries.SPECS
    specs += extra_queries.SPECS
    specs += analytics_queries.SPECS
    specs += olap_queries.SPECS
    specs += olap_queries2.SPECS
    specs += training_queries.SPECS
    specs += extraction_queries.SPECS
    specs += annotation_queries.SPECS
    specs += ann_queries.SPECS
    specs += retrieval_queries.SPECS
    specs += behavior_queries.SPECS
    specs += layout_queries.SPECS
    specs += curation_queries.SPECS
    specs += sketch_queries.SPECS
    specs += drift_queries.SPECS
    from collections import Counter

    names = [s.name for s in specs]
    dups = [n for n, c in Counter(names).items() if c > 1]
    assert not dups, f"duplicate query names: {dups}"

    # Stalest-first: never-verified gates (round -1) lead, then the
    # oldest driver evidence; declaration order breaks ties so the
    # ordering is deterministic for a given set of committed
    # CORRECTNESS_r*.json files.
    last = last_verified_round()
    ordered = [
        s
        for _, s in sorted(
            enumerate(specs), key=lambda t: (last.get(t[1].name, -1), t[0])
        )
    ]
    return ordered


QUERY_SPECS: list[QuerySpec] = _collect_specs()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in QUERY_SPECS}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in QUERY_SPECS if s.oracle is not None}


def driver_checked_names(repo_root: str | None = None) -> set[str]:
    """Names with at least one VERIFIED driver CORRECTNESS row (any
    round).  Verified = ``err`` null AND ``hash_match`` true: errored
    rows (ADVICE r04) and driver-RED rows (r05 review) both keep the
    query unchecked."""
    return set(last_verified_round(repo_root))


def unverified_backlog() -> list[str]:
    """Queries outside the driver's 50-entry window that have never had
    a verified driver CORRECTNESS row.  Empty by construction under the
    staleness ordering (never-verified sorts to round -1, the front of
    the window) whenever the never-verified count fits in the window —
    tests/test_registry_window.py asserts it."""
    checked = driver_checked_names()
    return [s.name for s in QUERY_SPECS[50:] if s.name not in checked]
