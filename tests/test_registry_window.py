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

import pytest

from swisscourtrulingcorpus_spark.plans.registry import (
    QUERY_SPECS,
    driver_checked_names,
    last_verified_round,
    unverified_backlog,
)

# Slow tier (pytest.ini): multi-minute suite, deselected from the
# default run so the round driver's pytest window completes.
pytestmark = pytest.mark.slow


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


def test_full_sweep_artifact_current_and_green():
    """VERDICT r06 "what's wrong" #3: with 207+ gates and a 50-wide
    driver window, steady-state staleness is 5 rounds, so every round
    must commit a FULL-registry sweep artifact (SWEEP_r{N}.json from
    `python tools/driver_sim.py --sweep`) as driver-facing evidence for
    the gates outside the window.  Current = the sweep's round is AT
    LEAST the newest committed CORRECTNESS round: while round N is in
    progress the newest CORRECTNESS file is r{N-1} and the sweep must
    be r{N}, but the driver stamps CORRECTNESS_r{N}.json AFTER the
    session closes, so at judge time sweep == correctness == N is the
    legitimate end-of-round state (the r07 judge-time false red —
    VERDICT r07 item 1).  Complete = it covers every registered gate;
    green = every row hash-matched with no error."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweeps = {
        int(m.group(1)): p
        for p in glob.glob(os.path.join(root, "SWEEP_r*.json"))
        if (m := re.search(r"SWEEP_r(\d+)\.json$", p))
    }
    assert sweeps, "no SWEEP_r*.json committed — run tools/driver_sim.py --sweep"
    correctness_rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    newest_corr = max(correctness_rounds) if correctness_rounds else 0
    newest = max(sweeps)
    assert newest >= newest_corr, (
        f"latest sweep is r{newest:02d} but CORRECTNESS_r{newest_corr:02d}"
        ".json is already committed — re-run tools/driver_sim.py --sweep"
    )
    with open(sweeps[newest]) as f:
        rows = json.load(f)
    names = {s.name for s in QUERY_SPECS}
    missing = sorted(names - set(rows))
    assert missing == [], f"sweep r{newest:02d} missing gates: {missing}"
    not_green = sorted(
        n
        for n, r in rows.items()
        if n in names and (r.get("err") is not None or r.get("hash_match") is False)
    )
    assert not_green == [], f"sweep r{newest:02d} non-green gates: {not_green}"


def _iter_jvm_tree(node):
    """Depth-first over a Catalyst TreeNode (plan or expression) via py4j."""
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        children = n.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


# Catalyst expression classes whose double results come from libm and
# are therefore NOT bit-identical across engines.  IEEE basic ops
# (+ - * / sqrt) are correctly-rounded by the standard and DO produce
# bit-identical doubles on identical inputs — which is why the cosine
# ranking family (dot / (sqrt * sqrt), same fold order as the oracle's
# list_dot_product) is exact without snapping, while anything through
# ln/exp/pow has already diverged three times (BM25/TF-IDF/citation
# relevance — ADVICE r06).
_TRANSCENDENTAL = frozenset(
    {
        "Log", "Logarithm", "Log1p", "Log2", "Log10",
        "Exp", "Expm1", "Pow", "Power",
        "Sin", "Cos", "Tan", "Asin", "Acos", "Atan", "Atan2",
        "Sinh", "Cosh", "Tanh", "Cbrt", "Hypot",
        # opaque Python/Scala UDF outputs: nothing guarantees the oracle
        # reproduces their float bits, so a raw-double ranking key from
        # a UDF is flagged the same way
        "PythonUDF", "ScalaUDF",
    }
)


def _unsnapped_transcendentals(expr, alias_map, depth: int = 0):
    """Yield transcendental/UDF nodes reachable from a sort key WITHOUT
    passing through a Round/BRound (a Round ancestor snaps the whole
    subtree to a decimal grid, making it engine-stable).  Attribute
    references are chased to their defining Alias — Catalyst extracts
    window sort keys into `_w0`-style projections, so the raw ref alone
    says nothing."""
    if depth > 64:
        return
    name = expr.getClass().getSimpleName()
    if name in ("Round", "BRound"):
        return
    if name == "AttributeReference":
        target = alias_map.get(str(expr.exprId()))
        if target is not None:
            yield from _unsnapped_transcendentals(target, alias_map, depth + 1)
        return
    if name in _TRANSCENDENTAL:
        yield name
        return
    children = expr.children()
    for i in range(children.size()):
        yield from _unsnapped_transcendentals(children.apply(i), alias_map, depth + 1)


def test_no_unsnapped_transcendental_order_under_ranking_windows(spark, sf_dir):
    """VERDICT r06 "what's wrong" #4: walk every gate's ANALYZED plan
    and reject any row_number/rank/dense_rank/ntile window whose ORDER
    BY contains a float key derived from an UN-snapped transcendental
    (ln/exp/pow/UDF) — libm ULP divergence flips adjacent ranks across
    engines, so such keys must pass through round(x, 9) (or be
    integer-snapped) before ordering.  Basic-op doubles (+ - * / sqrt
    over identical inputs) are correctly-rounded per IEEE 754 and pass."""
    ranking = {"RowNumber", "Rank", "DenseRank", "NTile"}
    offenders = []
    for s in QUERY_SPECS:
        plan = s.spark(spark, sf_dir)._jdf.queryExecution().analyzed()
        # exprId -> defining child expression, from every Alias in the
        # plan (Project lists, Aggregate outputs, Window outputs)
        alias_map = {}
        windows = []
        for node in _iter_jvm_tree(plan):
            exprs = node.expressions()
            for i in range(exprs.size()):
                for e in _iter_jvm_tree(exprs.apply(i)):
                    kind = e.getClass().getSimpleName()
                    if kind == "Alias":
                        alias_map[str(e.exprId())] = e.child()
                    elif kind == "WindowExpression":
                        windows.append(e)
        for e in windows:
            if e.windowFunction().getClass().getSimpleName() not in ranking:
                continue
            order = e.windowSpec().orderSpec()
            for j in range(order.size()):
                key = order.apply(j).child()
                if key.dataType().typeName() in ("double", "float"):
                    bad = sorted(set(_unsnapped_transcendentals(key, alias_map)))
                    if bad:
                        offenders.append(
                            (
                                s.name,
                                key.sql() if hasattr(key, "sql") else str(key),
                                tuple(bad),
                            )
                        )
    assert sorted(set(offenders)) == [], (
        "ranking windows ordered by unsnapped transcendental float keys "
        f"(snap with round(x, 9) on BOTH engines): {sorted(set(offenders))}"
    )


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
