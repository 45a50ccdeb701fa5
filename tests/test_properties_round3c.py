"""Hypothesis property tests for the round-3c modules: expectations
vs a pandas recount, Morton keys vs a python bit-interleave, versioned
commit sequences vs a python model of the manifest log."""

from __future__ import annotations

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from swisscourtrulingcorpus_spark.operators import expectations as X
from swisscourtrulingcorpus_spark.sources import layout
from swisscourtrulingcorpus_spark.sources import versioned as V

_SETTINGS = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),
        st.floats(-10, 120, allow_nan=False),
        st.sampled_from(["O", "F", "P", "Z", None]),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_rows)
@settings(**_SETTINGS)
def test_expectations_match_pandas(spark, rows):
    df = spark.createDataFrame(
        [(a, b, c) for a, b, c in rows], "id bigint, amount double, status string"
    )
    rep = X.table_expectations(
        df,
        "t",
        [
            X.not_null("id"),
            X.in_range("amount", 0, 100),
            X.accepted_values("status", ["O", "F", "P"]),
        ],
    )
    got = {r["check"]: r.violations for r in rep.collect()}
    pdf = pd.DataFrame(rows, columns=["id", "amount", "status"])
    assert got["t.not_null:id"] == int(pdf["id"].isna().sum())
    assert got["t.in_range:amount"] == int(
        (pdf["amount"].notna() & ~pdf["amount"].between(0, 100)).sum()
    )
    assert got["t.accepted_values:status"] == int(
        (pdf["status"].notna() & ~pdf["status"].isin(["O", "F", "P"])).sum()
    )


def _interleave(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=2,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_zorder_value_matches_python_interleave(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    bits = 10
    # identity scaling: min 0, max 2^bits - 1 makes the linear scale a no-op
    z = layout.zorder_value(["a", "b"], [0, 0], [1023, 1023], bits=bits)
    got = [r.z for r in df.select(z.alias("z")).collect()]
    want = [_interleave(a, b, bits) for a, b in pairs]
    assert got == want


@given(sizes=st.lists(st.integers(1, 20), min_size=1, max_size=4))
@settings(deadline=None, max_examples=5,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_versioned_commit_log_model(spark, tmp_path_factory, sizes):
    table = str(tmp_path_factory.mktemp("vt"))
    committed = []
    for n in sizes:
        v = V.commit_version(spark.range(n), table)
        committed.append((v, n))
    assert V.versions(table) == [v for v, _ in committed]
    for v, n in committed:
        assert V.read_version(spark, table, v).count() == n
    # vacuum to 1 keeps only the last snapshot readable
    V.vacuum(table, keep=1)
    last_v, last_n = committed[-1]
    assert V.versions(table) == [last_v]
    assert V.read_version(spark, table).count() == last_n
    assert len(os.listdir(os.path.join(table, "data"))) == 1
