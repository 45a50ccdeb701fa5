"""PageRank / degree stats (`operators/graph.py`): numpy power-
iteration cross-check, dangling-mass conservation, degree counts."""

from __future__ import annotations

import numpy as np
import pytest

from swisscourtrulingcorpus_spark.operators.graph import degree_stats, pagerank

# a small digraph with a dangling node (4) and a hub (0)
_EDGES = [(1, 0), (2, 0), (3, 0), (0, 4), (2, 3), (3, 2), (1, 2)]


def _numpy_pagerank(edges, n, d=0.85, iters=60):
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return r


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(_EDGES, "src bigint, dst bigint")


def test_pagerank_matches_numpy(spark, edges_df):
    got = {r.node: r["rank"] for r in pagerank(edges_df, "src", "dst", max_iter=60).collect()}
    want = _numpy_pagerank(_EDGES, 5)
    for node in range(5):
        assert abs(got[node] - want[node]) < 1e-6, node
    # ranks conserve total mass (dangling redistributed, not lost)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub everyone cites outranks its citers
    assert got[0] > got[1] and got[0] > got[2] and got[0] > got[3]


def test_degree_stats(spark, edges_df):
    got = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(edges_df, "src", "dst").collect()}
    assert got[0] == (1, 3)
    assert got[4] == (0, 1)  # dangling: in-only
    assert got[2] == (2, 2)


def test_pagerank_empty(spark):
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(empty, "src", "dst").count() == 0
