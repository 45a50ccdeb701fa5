"""Round-8 operator tests: full coreness decomposition (VERDICT r07
item 5) and its agreement with the fixed-k peel."""

from __future__ import annotations

import random

import pytest

from swisscourtrulingcorpus_spark.operators.graph import coreness, k_core


def _ref_coreness(edges):
    """Batagelj–Zaversnik min-degree peel (public textbook algorithm):
    core(v) = running max of v's degree at removal time."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    remaining = set(adj)
    k = 0
    while remaining:
        v = min(remaining, key=lambda u: (deg[u], u))
        k = max(k, deg[v])
        core[v] = k
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def test_coreness_known_structures(spark):
    """Closed-form shapes: a 4-clique sits at 3, a chain hanging off it
    at 1, an isolated edge at 1, a separate 5-cycle at 2 — and the
    values agree with the reference peel."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 10), (10, 11), (11, 12), (20, 21),
             (30, 31), (31, 32), (32, 33), (33, 34), (34, 30)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["node"]: r["coreness"] for r in coreness(df).collect()}
    want = {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1, 12: 1, 20: 1, 21: 1,
            30: 2, 31: 2, 32: 2, 33: 2, 34: 2}
    assert got == want
    assert got == _ref_coreness(edges)


def test_coreness_matches_reference_peel_random_graphs(spark):
    """Erdős–Rényi-ish random graphs (seeded): the h-index fixed point
    must equal the min-degree peel's value for every node, including
    duplicate and reversed edge rows (the symmetrize+distinct
    contract)."""
    rng = random.Random(8)
    for n, m in [(12, 20), (20, 45), (30, 90)]:
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        noisy = edges + [(b, a) for a, b in edges[::3]] + edges[::5]
        df = spark.createDataFrame(noisy, "id_a: long, id_b: long")
        got = {r["node"]: r["coreness"] for r in coreness(df).collect()}
        assert got == _ref_coreness(edges)


def test_coreness_consistent_with_fixed_k_core(spark):
    """The decomposition must agree with the fixed-k building block:
    {v : coreness(v) >= k} is exactly k_core(k)'s node set."""
    rng = random.Random(88)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(70)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    cor = {r["node"]: r["coreness"] for r in coreness(df).collect()}
    for k in (1, 2, 3, 4):
        want = {v for v, c in cor.items() if c >= k}
        got = {r["node"] for r in k_core(df, k=k, max_rounds=60).collect()}
        assert got == want, f"k={k}"


def test_coreness_nonconvergence_raises_and_empty_is_empty(spark):
    """A cascade deeper than the round cap must raise loudly (never a
    partial decomposition); an edgeless input yields an empty result."""
    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "id_a: long, id_b: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        coreness(df, max_rounds=2)

    empty = spark.createDataFrame([], "id_a: long, id_b: long")
    assert coreness(empty).count() == 0
