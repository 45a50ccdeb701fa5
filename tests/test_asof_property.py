"""As-of join correctness against a brute-force reference on random data."""

from __future__ import annotations

import random

import pyspark.sql.functions as F


def _brute_force_asof(lefts, rights, tol):
    """For each (k, t) in lefts: the max r <= t within tol, else None."""
    out = {}
    for k, t, lid in lefts:
        cands = [r for rk, r in rights if rk == k and r <= t and t - r < tol]
        out[lid] = max(cands) if cands else None
    return out


def test_asof_join_matches_brute_force(spark):
    from swisscourtrulingcorpus_spark.operators.relational import asof_join

    rng = random.Random(7)
    lefts = [
        (rng.randrange(5), rng.randrange(1000), i) for i in range(300)
    ]
    rights = [(rng.randrange(5), rng.randrange(1000)) for _ in range(200)]
    tol = 50

    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in lefts], ["k", "t", "lid"]
    )
    rdf = spark.createDataFrame(rights, ["k", "r"]).withColumn(
        "payload", F.col("r")
    )
    got = asof_join(
        ldf,
        rdf,
        partition_keys=["k"],
        left_on="t",
        right_on="r",
        tolerance=F.lit(tol),
        right_payload=["payload"],
    )
    got_map = {row.lid: row.asof_payload for row in got.collect()}
    want = _brute_force_asof(lefts, rights, tol)
    assert got_map == want
