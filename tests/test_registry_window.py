"""Driver-window hygiene (VERDICT r03 item 10, r04 item 1).

The round driver evaluates only the first 50 registry entries.  Round 3
declared more new queries than fit, so 22 gates went three rounds with
no driver CORRECTNESS row; round 4 closed that backlog but left 50
gates whose last driver evidence was from round 2.  Round 5 replaced
the manually curated promotion list with a self-rotating STALENESS
ordering: specs sort by the round of their last verified driver row
(never-verified first), so each round the driver re-checks exactly the
50 queries with the oldest evidence.  These tests pin that invariant.
"""

from __future__ import annotations

from swisscourtrulingcorpus_spark.plans.registry import (
    QUERY_SPECS,
    driver_checked_names,
    last_verified_round,
    unverified_backlog,
)


def test_registry_is_ordered_stalest_first():
    """The registry ordering IS the rotation policy: last-verified
    round must be non-decreasing along QUERY_SPECS, so the driver's
    50-entry window always holds the stalest evidence."""
    last = last_verified_round()
    rounds = [last.get(s.name, -1) for s in QUERY_SPECS]
    assert rounds == sorted(rounds), (
        "registry not sorted stalest-first; first offenders: "
        + str(
            [
                (QUERY_SPECS[i].name, rounds[i], rounds[i + 1])
                for i in range(len(rounds) - 1)
                if rounds[i] > rounds[i + 1]
            ][:5]
        )
    )


def test_never_checked_queries_fit_in_driver_window():
    checked = driver_checked_names()
    never = [s.name for s in QUERY_SPECS if s.name not in checked]
    backlog = unverified_backlog()
    if len(never) <= 50:
        assert backlog == [], (
            f"{len(backlog)} never-driver-checked queries sit outside "
            f"the 50-entry window despite fitting: {backlog}"
        )
    else:
        window_names = {s.name for s in QUERY_SPECS[:50]}
        wasted = window_names & checked
        assert not wasted, (
            f"backlog ({len(never)}) exceeds the window but already-"
            f"checked queries occupy slots: {sorted(wasted)}"
        )


def test_max_staleness_bounded():
    """With the backlog empty, no gate's last verified driver row may
    be older than ceil(n_specs / 50) rounds behind the newest committed
    CORRECTNESS file — the steady-state bound of a 50-wide rotation.
    (Window occupants are exempt: they are being re-checked this
    round.)"""
    last = last_verified_round()
    if not last or unverified_backlog():
        return
    newest = max(last.values())
    bound = -(-len(QUERY_SPECS) // 50)  # ceil
    stale = [
        (s.name, last[s.name])
        for s in QUERY_SPECS[50:]
        if s.name in last and newest - last[s.name] > bound
    ]
    assert stale == [], (
        f"gates outside the window with driver evidence older than "
        f"{bound} rounds (newest file r{newest:02d}): {stale}"
    )


def test_err_rows_do_not_count_as_verified():
    """ADVICE r04: a row with a non-null err (e.g. no_oracle) must not
    mark a query as driver-checked."""
    import json

    checked = driver_checked_names("/tmp/_nonexistent_repo_root")
    assert checked == set()

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        with open(os.path.join(root, "CORRECTNESS_r01.json"), "w") as f:
            json.dump(
                {
                    "good": {"err": None, "hash_match": True},
                    "bad": {"err": "no_oracle"},
                    # ran but came back RED (the r03 dtype class): must
                    # NOT count as verified or the broken gate rotates
                    # to the back of the window (r05 review)
                    "red": {"err": None, "hash_match": False, "rows_match": True},
                },
                f,
            )
        assert driver_checked_names(root) == {"good"}
        assert last_verified_round(root) == {"good": 1}


def test_registry_has_no_duplicate_names():
    names = [s.name for s in QUERY_SPECS]
    assert len(names) == len(set(names))


def test_no_array_or_map_columns_in_gate_output(spark, sf_dir):
    """VERDICT r05 item 1: the driver's value-hash canonicalizer sorts
    output cells through pandas and cannot hash list/dict cells, so a
    gate emitting a raw ArrayType/MapType column can never be
    value-verified (int8_quantize_embeddings was red all of r05 for
    exactly this).  Array-valued results must be spread to scalar
    columns or joined to a string before leaving the gate."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for s in QUERY_SPECS:
        schema = s.spark(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((s.name, f.name, f.dataType.simpleString()))
    assert offenders == [], (
        "gates with un-hashable output columns (spread or array_join "
        f"them): {offenders}"
    )
