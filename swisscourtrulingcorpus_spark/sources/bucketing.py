"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4).

The reference leans on Postgres indexes (`config.ini [postgres]
indexes`); the lakehouse equivalent for the big fact⋈fact joins
(decision⋈section, orders⋈lineitem) is BUCKETING: both tables
hash-partitioned into the same number of buckets on the join key at
write time, so the join needs NO exchange at read time — at 100 TB
that deletes the single largest shuffle in the pipeline.

Spark's bucketing rides the session catalog (`saveAsTable`), so these
helpers manage warehouse tables, not bare parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Materialize as a bucketed (and optionally sort-bucketed) table.
    Sorting within buckets additionally removes the join's Sort."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — Catalyst sees
    matching output partitionings and plans a SortMergeJoin with ZERO
    Exchange (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
