"""Mirror of the driver's correctness gate, runnable locally.

For every registered query with an oracle: run the Spark DataFrame
program AND the DuckDB SQL on the same parquet tables, sort columns by
name, sort rows, and require exact value equality (strings/ints exact;
doubles bit-exact — the whole engine is built so both sides compute
identical doubles, see plans/registry.py docstring).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from swisscourtrulingcorpus_spark.plans.parity import normalize
from swisscourtrulingcorpus_spark.plans.registry import QUERY_SPECS


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = normalize(df)
    # repr-keyed row sort: deterministic over mixed None/scalar object
    # columns, identical pairing on both sides when values match
    key = df.apply(lambda col: col.map(repr))
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


ORACLE_SPECS = [s for s in QUERY_SPECS if s.oracle is not None]
NO_ORACLE_SPECS = [s for s in QUERY_SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_matches_oracle(spec, spark, duck, sf_dir):
    got = spec.spark(spark, sf_dir).toPandas()
    want = duck.execute(spec.oracle).fetchdf()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{spec.name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{spec.name}: row count {len(got)} vs {len(want)}"

    g = _normalize(got)
    w = _normalize(want)
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            # dtype-sensitive like the driver's hash: int 3882 is NOT
            # float 3882.0 (see plans/parity.py)
            assert type(a) is type(b), (
                f"{spec.name}.{c}[{i}]: dtype {type(a).__name__} "
                f"({a!r}) != {type(b).__name__} ({b!r})"
            )
            if isinstance(a, float) and math.isnan(a) and math.isnan(b):
                continue
            assert a == b, f"{spec.name}.{c}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("spec", NO_ORACLE_SPECS, ids=[s.name for s in NO_ORACLE_SPECS] or ["none"])
def test_rows_only(spec, spark, sf_dir):
    if spec == "none":
        pytest.skip("no oracle-less specs")
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
