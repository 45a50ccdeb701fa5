"""Data-quality expectations: declarative constraint checks that
compile to the minimum number of passes over the data.

A 100 TB pipeline runs validation between every stage; the design
constraint is pass-count, not expressiveness:

- Row-level expectations (not-null, range, accepted-values, regex)
  against ONE table all fold into a SINGLE aggregation scan —
  ``sum(when(violated, 1))`` per check plus the row total, melted to
  one row per check via an explode of literal structs.  N checks on a
  table cost exactly one scan regardless of N.
- Set-level expectations need their own shuffle and are separate
  builders: ``expect_unique`` (one groupBy), ``expect_foreign_key``
  (broadcast-or-shuffle anti-join — Catalyst picks by parent size).

Every check emits the same schema (check, violations, total), so the
report is a ``unionByName`` and lands in one small table — the shape
an orchestration layer alerts on.

Reference parity: the reference validates ad hoc (asserts in
`text_to_database.py`, coverage reports in `report_creator.py`); this
module is the systematic replacement the Spark engine needs to run
unattended at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    """A named row-level violation predicate (True = row violates)."""

    name: str
    violated: Column


def not_null(col: str) -> RowCheck:
    return RowCheck(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> RowCheck:
    """Violated when outside [lo, hi]; nulls do not violate (compose
    with ``not_null`` when nulls are also illegal)."""
    c = F.col(col)
    return RowCheck(
        f"in_range:{col}", c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    )


def accepted_values(col: str, values: list) -> RowCheck:
    c = F.col(col)
    return RowCheck(
        f"accepted_values:{col}", c.isNotNull() & ~c.isin(*values)
    )


def matches_regex(col: str, pattern: str) -> RowCheck:
    c = F.col(col)
    return RowCheck(
        f"matches_regex:{col}", c.isNotNull() & ~c.rlike(pattern)
    )


def table_expectations(df: DataFrame, table: str, checks: list[RowCheck]) -> DataFrame:
    """All row-level checks in ONE aggregation scan.  Output: one row
    per check — (check, violations, total)."""
    aggs = [
        # coalesce: sum over ZERO rows is NULL — an empty table must
        # report 0 violations, not unknown
        F.coalesce(
            F.sum(F.when(c.violated, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).alias(f"__v{i}")
        for i, c in enumerate(checks)
    ] + [F.count(F.lit(1)).alias("__total")]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(f"{table}.{c.name}").alias("check"),
                F.col(f"__v{i}").cast("bigint").alias("violations"),
                F.col("__total").cast("bigint").alias("total"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(entries).alias("__e")).select("__e.*")


def expect_unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """Duplicate-key count: rows beyond the first per key (0 when the
    key is unique).  One groupBy shuffle on the key."""
    name = f"{table}.unique:{','.join(cols)}"
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
        )
    )
    return dup.select(
        F.lit(name).alias("check"),
        F.col("violations").cast("bigint"),
        F.col("total").cast("bigint"),
    )


def expect_foreign_key(
    child: DataFrame,
    table: str,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Orphaned-row count: child rows (with non-null key) whose key has
    no parent.  Anti-join — broadcast when the parent is dim-sized,
    shuffle otherwise; null keys are not orphans (compose with
    ``not_null``)."""
    name = f"{table}.fk:{child_key}"
    total = child.agg(F.count(F.lit(1)).alias("total"))
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            on=child_key,
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return orphans.crossJoin(total).select(
        F.lit(name).alias("check"),
        F.col("violations").cast("bigint"),
        F.col("total").cast("bigint"),
    )


def expect_functional_dependency(
    df: DataFrame,
    table: str,
    lhs: list[str],
    rhs: str,
) -> DataFrame:
    """Functional-dependency check lhs → rhs: a VIOLATING group is an
    lhs key whose rows carry more than one distinct rhs value — the
    schema-inference / normalization primitive (`expect_unique` is the
    degenerate lhs → ALL case; this one names the dependent column and
    counts how badly it fails).  Output one row:
    (check, violations = violating lhs groups, total = lhs groups).

    Scale shape: ONE groupBy on (lhs, rhs) with map-side combine
    collapses the table to its distinct dependency pairs, then a
    groups-sized second agg — the fact rows shuffle once and only as
    their distinct (lhs, rhs) combinations."""
    name = f"{table}.fd:{','.join(lhs)}->{rhs}"
    per = (
        df.select(*lhs, rhs)
        .distinct()
        .groupBy(*lhs)
        .agg(F.count(F.lit(1)).alias("__n_rhs"))
    )
    agg = per.agg(
        F.coalesce(
            F.count(F.when(F.col("__n_rhs") > 1, 1)), F.lit(0)
        ).alias("violations"),
        F.count(F.lit(1)).alias("total"),
    )
    return agg.select(
        F.lit(name).alias("check"),
        F.col("violations").cast("bigint"),
        F.col("total").cast("bigint"),
    )


def table_profile(df: DataFrame, table: str, columns: list[str]) -> DataFrame:
    """ANALYZE-style column statistics in ONE aggregation pass: per
    column — rows, nulls, exact distinct count, min/max (as strings so
    the report schema is uniform).  These are the statistics that feed
    broadcast-vs-shuffle decisions and data-skipping expectations; the
    exact NDV is a full count-distinct (the profile job is periodic,
    not per-query — use `sketches.approx_distinct_by` when a cheap
    estimate suffices)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(columns):
        aggs += [
            F.count(c).alias(f"__nn{i}"),
            F.countDistinct(c).alias(f"__ndv{i}"),
            F.min(c).cast("string").alias(f"__min{i}"),
            F.max(c).cast("string").alias(f"__max{i}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(f"{table}.{c}").alias("column"),
                F.col("__rows").cast("bigint").alias("n_rows"),
                (F.col("__rows") - F.col(f"__nn{i}")).cast("bigint").alias("n_nulls"),
                F.col(f"__ndv{i}").cast("bigint").alias("ndv"),
                F.col(f"__min{i}").alias("min_value"),
                F.col(f"__max{i}").alias("max_value"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return row.select(F.explode(entries).alias("__e")).select("__e.*")


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-check results into the one small report table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def foreign_key_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Multi-relationship referential-integrity audit — the detailed
    extension of :func:`expect_foreign_key` (which it composes for the
    orphan anti-join): per (name, child, child_key, parent,
    parent_key) relationship one row of (relationship, n_rows,
    n_null_keys, n_orphans), separating null keys (not orphans, but
    not joinable either) from true orphans — the report a warehouse
    reads before trusting its star joins.

    Scale shape per relationship: the composed anti-join against the
    distinct-parent projection (dimension-sized, broadcastable)
    feeding a 1-row aggregate, plus one map-side null count; the
    report is len(relations) rows."""
    outs = []
    for name, child, ckey, parent, pkey in relations:
        base = expect_foreign_key(child, name, ckey, parent, pkey)
        nulls = child.agg(
            F.coalesce(
                F.sum(F.col(ckey).isNull().cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("n_null_keys")
        )
        outs.append(
            base.crossJoin(F.broadcast(nulls)).select(
                F.lit(name).alias("relationship"),
                F.col("total").alias("n_rows"),
                "n_null_keys",
                F.col("violations").alias("n_orphans"),
            )
        )
    return quality_report(outs)
