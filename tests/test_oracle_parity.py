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

from swisscourtrulingcorpus_spark.plans.registry import QUERY_SPECS


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # nullable int columns arrive as float on the pandas side or as
        # object — normalize numerics to float64, everything else to str
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype("object").where(df[c].notna(), None)
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


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
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{spec.name}.{c}[{i}]: {a!r} != {b!r}"
            else:
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
