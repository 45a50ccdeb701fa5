"""Driver-window hygiene (VERDICT r03 item 10).

The round driver evaluates only the first 50 registry entries.  Round 3
declared more new queries than fit, so 22 gates went three rounds with
no driver CORRECTNESS row.  This test makes that impossible to repeat
silently: every query that has never appeared in a committed
CORRECTNESS_r*.json must sit inside the 50-entry window (or the backlog
must genuinely exceed the window, in which case the front of the window
must be entirely never-checked names — no wasted slots).
"""

from __future__ import annotations

from swisscourtrulingcorpus_spark.plans.registry import (
    QUERY_SPECS,
    driver_checked_names,
    unverified_backlog,
)


def test_never_checked_queries_fit_in_driver_window():
    checked = driver_checked_names()
    never = [s.name for s in QUERY_SPECS if s.name not in checked]
    backlog = unverified_backlog()
    if len(never) <= 50:
        assert backlog == [], (
            f"{len(backlog)} never-driver-checked queries sit outside the "
            f"50-entry window despite fitting: {backlog} — promote them "
            "into registry._FRONT_OF_WINDOW"
        )
    else:
        window_names = {s.name for s in QUERY_SPECS[:50]}
        wasted = window_names & checked
        assert not wasted, (
            f"backlog ({len(never)}) exceeds the window but already-"
            f"checked queries occupy slots: {sorted(wasted)}"
        )


def test_registry_has_no_duplicate_names():
    names = [s.name for s in QUERY_SPECS]
    assert len(names) == len(set(names))
