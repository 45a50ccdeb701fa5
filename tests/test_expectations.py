"""Data-quality expectations (`operators/expectations.py`): violation
counting on fixtures with injected defects, and the one-scan plan
guarantee for row-level checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators import expectations as X


def _bad_rows(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "O"),      # range violation
            (None, 20.0, "F"),   # null violation
            (4, 30.0, "Z"),      # accepted-values violation
            (4, 40.0, "P"),      # duplicate id
        ],
        "id bigint, amount double, status string",
    )


def test_row_checks_count_violations(spark):
    df = _bad_rows(spark)
    rep = X.table_expectations(
        df,
        "t",
        [
            X.not_null("id"),
            X.in_range("amount", 0, 100),
            X.accepted_values("status", ["O", "F", "P"]),
        ],
    )
    got = {r["check"]: (r.violations, r.total) for r in rep.collect()}
    assert got == {
        "t.not_null:id": (1, 5),
        "t.in_range:amount": (1, 5),
        "t.accepted_values:status": (1, 5),
    }


def test_unique_and_fk(spark):
    df = _bad_rows(spark)
    uniq = X.expect_unique(df.where(F.col("id").isNotNull()), "t", ["id"]).collect()[0]
    assert (uniq.violations, uniq.total) == (1, 4)

    parent = spark.createDataFrame([(1,), (2,)], "id bigint")
    fk = X.expect_foreign_key(df, "t", "id", parent, "id").collect()[0]
    # ids 4, 4 are orphans; the null id is not
    assert (fk.violations, fk.total) == (2, 5)


def test_row_checks_single_scan(spark, sf_dir, explain_plan):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = X.table_expectations(
        orders,
        "orders",
        [
            X.not_null("o_custkey"),
            X.in_range("o_totalprice", 0, 10**9),
            X.accepted_values("o_orderstatus", ["O", "F", "P"]),
            X.matches_regex("o_orderpriority", r"^\d-"),
        ],
    )
    plan = explain_plan(rep)
    # four checks, ONE scan of the table: formatted mode prints each
    # node in the tree AND the details section, so count the numbered
    # detail entries ("(n) Scan parquet") — exactly one per scan
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_clean_fixture_reports_zero_violations(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rep = X.quality_report(
        [
            X.table_expectations(orders, "orders", [X.not_null("o_custkey")]),
            X.expect_unique(orders, "orders", ["o_orderkey"]),
            X.expect_foreign_key(orders, "orders", "o_custkey", customer, "c_custkey"),
        ]
    )
    rows = rep.collect()
    assert len(rows) == 3
    assert all(r.violations == 0 for r in rows)
    assert all(r.total == orders.count() for r in rows)
