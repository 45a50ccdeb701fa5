"""Curation-funnel runner: ordered named steps over a corpus with a
per-stage row report — the FineWeb/RefinedWeb pipeline shape (quality
filter → lexicon filter → dedup → mixture sample), where the per-stage
retention numbers ARE the deliverable a data-curation team reviews
before a training run.

Scale note: each stage's count is a 1-row aggregate; the report is the
lazy union of those aggregates, so collecting it executes each stage
prefix once per count.  At benchmark scale that's fine; at 100 TB pass
``cache_intermediate=True`` (persist each stage before counting) or
materialize stages to the versioned store between counts — the runner
deliberately does not hide that choice.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Step = tuple[str, Callable[[DataFrame], DataFrame]]


def funnel(
    df: DataFrame,
    steps: list[Step],
    cache_intermediate: bool = False,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Apply ``steps`` in order; return (final_df, report_df, cached)
    where the report has one (step, rows_out) row per stage plus the
    leading ('input', n) row.  Report rows are lazy 1-row aggregates
    unioned — one job materializes the whole funnel table.

    ``cached`` holds the persisted intermediates when
    ``cache_intermediate`` is on (empty otherwise) so the CALLER can
    unpersist them once the report/final frame has materialized —
    previously the persisted frames were unreachable and their blocks
    lived for the rest of the SparkSession (r06 review; the repo's
    cache discipline is always cache/finally-unpersist, see
    `streaming/jobs.py::minhash_dedup_batch`)."""
    reports = [
        df.agg(F.count(F.lit(1)).alias("rows_out")).select(
            F.lit("input").alias("step"), F.col("rows_out").cast("long")
        )
    ]
    cached: list[DataFrame] = []
    cur = df
    for name, fn in steps:
        cur = fn(cur)
        if cache_intermediate:
            cur = cur.persist()
            cached.append(cur)
        reports.append(
            cur.agg(F.count(F.lit(1)).alias("rows_out")).select(
                F.lit(name).alias("step"), F.col("rows_out").cast("long")
            )
        )
    report = reduce(lambda a, b: a.unionByName(b), reports)
    return cur, report, cached
