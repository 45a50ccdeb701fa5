"""Dtype-sensitive value comparison shared by the local correctness
replica (`tools/driver_sim.py`) and `tests/test_oracle_parity.py`.

The round driver's value hash distinguishes ``3882`` (int64) from
``3882.0`` (float64) — DuckDB ``sum(int)`` returns HUGEINT which pandas
renders as float64, while Spark's ``sum(bigint)`` arrives as int64, so
an oracle that forgets ``CAST(sum(...) AS BIGINT)`` hashes differently
even when every value is numerically equal.  Round 3 shipped a replica
that coerced all numerics to float64 before hashing, which masked
exactly that class of bug (4 driver-red gates).  This module models the
driver faithfully: values are converted to *Python* scalars (so int32
vs int64 compare equal, but int vs float do not) and hashed via
``repr``.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and convert cells to Python scalars.

    - bool / integer / float columns keep their *kind* (``repr(3882)``
      != ``repr(3882.0)``), but width is erased (int32 == int64);
    - everything else becomes ``str`` (``None`` for nulls), matching
      the driver's treatment of dates/timestamps/strings.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_bool_dtype(col):
            df[c] = col.map(lambda v: None if pd.isna(v) else bool(v))
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.map(lambda v: None if pd.isna(v) else int(v))
        elif pd.api.types.is_float_dtype(col):
            # Keep NaN as NaN (repr 'nan'), do NOT fold it into None:
            # pandas float64 already stores SQL NULL as NaN on both
            # sides (toPandas and fetchdf), so None would never appear
            # here anyway — but an explicit None mapping would also
            # have silently equated an engine's genuine NaN (0.0/0.0)
            # with the other's NULL in object columns promoted to
            # float.  NULL-vs-NaN cannot be distinguished at the
            # pandas-float level; that limitation is inherent to the
            # driver's own comparison, not introduced here.
            df[c] = col.map(
                lambda v: float("nan") if pd.isna(v) else float(v)
            )
        else:
            col = col.astype("object").where(col.notna(), None)
            df[c] = col.map(lambda v: None if v is None else str(v))
    return df


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive md5 over the normalized cell reprs."""
    df = normalize(df)
    rows = sorted(
        tuple(repr(v) for v in r)
        for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def plan_fingerprint(df) -> str:
    """Identity-normalized fingerprint of a DataFrame's OPTIMIZED
    logical plan: exprIds (``#123``/``#123L``) and plan ids are
    replaced with placeholders and whitespace collapsed, so two
    constructions of the SAME query fingerprint identically while any
    semantic difference (tables, predicates, literals, operator order)
    survives.  The registry duplicate-lint
    (tests/test_registry_lint.py) md5s this over every gate at
    sf0.001 and fails when two gates with different names resolve to
    the same plan — the mechanical guard VERDICT r08 item 5 asked for
    after round 8 shipped (and had to hand-delete) two semantic
    duplicates of existing operators."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    p = re.sub(r"#\d+L?", "#x", plan)
    p = re.sub(r"plan_id=\d+", "plan_id=x", p)
    p = re.sub(r"\s+", " ", p)
    # the TYPED schema is part of the identity: eager driver-report
    # gates optimize to a bare `LocalRelation [col#x, ...]`, which
    # prints column NAMES but not types — the binary and k-class
    # confident joints share (given_label, assigned, n_docs) and would
    # false-collide without the boolean-vs-string distinction (r11)
    p += " | " + df.schema.simpleString()
    return hashlib.md5(p.encode()).hexdigest()
