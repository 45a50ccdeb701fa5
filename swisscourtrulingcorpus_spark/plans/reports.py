"""Report computations (SURVEY.md A10–A13; `scrc/dataset_creation/
report_creator.py`).

The reference renders plots/CSVs per dataset; the expensive part — the
aggregations — is what matters at scale, so each report here is a
DataFrame program returning the report table.  Rendering (matplotlib /
xlsx, S12) happens driver-side on these already-tiny outputs and is
gated behind import-try since plotting libs may be absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.relational import value_counts_with_pct

# `dataset_creator.py:956` token-count bucket boundaries
TOKEN_BUCKETS = [0, 512, 1024, 2048, 4096, 8192]


def attribute_distribution(df: DataFrame, attr: str) -> DataFrame:
    """A10 plot_attribute (`report_creator.py:126-163`): histogram +
    percent-of-total for a categorical attribute."""
    return value_counts_with_pct(df, attr)


def input_length_stats(
    df: DataFrame, length_col: str, clip_at: int = 4000
) -> DataFrame:
    """A11 input-length describe() (`report_creator.py:66-112`):
    count/mean/min/quartiles/max, lengths clipped for the plot range."""
    clipped = F.least(F.col(length_col), F.lit(clip_at))
    return df.agg(
        F.count(F.lit(1)).alias("count"),
        F.avg(clipped).alias("mean"),
        F.min(clipped).alias("min"),
        F.expr(f"percentile(least({length_col}, {clip_at}), 0.25)").alias("p25"),
        F.expr(f"percentile(least({length_col}, {clip_at}), 0.5)").alias("p50"),
        F.expr(f"percentile(least({length_col}, {clip_at}), 0.75)").alias("p75"),
        F.max(clipped).alias("max"),
    )


def token_bucket_histogram(df: DataFrame, tokens_col: str) -> DataFrame:
    """A13 num_tokens bucketing (`dataset_creator.py:955-961`): counts
    per [0,512,1024,2048,4096,8192] bucket."""
    bucket = F.lit(len(TOKEN_BUCKETS) - 1)
    for i in range(len(TOKEN_BUCKETS) - 1, 0, -1):
        bucket = F.when(F.col(tokens_col) < TOKEN_BUCKETS[i], i - 1).otherwise(bucket)
    labels = [
        f"[{TOKEN_BUCKETS[i]},{TOKEN_BUCKETS[i + 1]})"
        for i in range(len(TOKEN_BUCKETS) - 1)
    ] + [f">={TOKEN_BUCKETS[-1]}"]
    label_map = F.array(*[F.lit(x) for x in labels])
    return (
        # nulls would fall through the when-chain into the top bucket —
        # they mean "not tokenized", not "huge"; exclude them
        df.where(F.col(tokens_col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.element_at(label_map, F.col("bucket") + 1).alias("bucket_range"),
            "cnt",
        )
    )


def label_distribution_by_split(df: DataFrame, label_col: str = "label") -> DataFrame:
    """A10 plot_label_ordered per split (`report_creator.py:164-185`)."""
    return (
        df.groupBy("split", label_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("split", F.desc("cnt"))
    )


def export_report_excel(report: DataFrame, path: str, sheet: str = "report") -> bool:
    """S12 Excel sink (`pattern_extractor.py:220-229`): driver-side
    render of an already-aggregated (tiny) report.  Returns False when
    no xlsx writer is available (openpyxl/xlsxwriter not installed) —
    the caller falls back to CSV."""
    pdf = report.toPandas()
    try:
        pdf.to_excel(path, sheet_name=sheet, index=False)
        return True
    except (ImportError, ModuleNotFoundError, ValueError):
        pdf.to_csv(path.replace(".xlsx", ".csv"), index=False)
        return False
