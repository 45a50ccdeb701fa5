"""End-to-end corpus build: the Spark counterpart of ``python -m scrc.main``.

The reference's top entry point runs scraper → text-to-db → language ID
→ cleaner → section splitter → extractors → dataset creators, using
Postgres as the inter-stage IR and progress files for resumability
(`scrc/main.py:96-136`, SURVEY.md §3.1).  Here the same DAG is one
driver program:

- the inter-stage IR is a parquet (lakehouse) directory — one table per
  domain entity, same names as the reference's schema;
- incremental processing (`process_new_files_only`,
  `abstract_preprocessor.py:48`) is the manifest anti-join: a second
  run over the same landing zone extracts only unseen file_names;
- dataset creators read the materialized tables and write
  split-partitioned exports (S10/S11).

Scale shape: each stage is a map-side pandas_udf chain over the raw
batch (no shuffle until the groupBys inside the creators), and the
landing-zone scan is whatever `spark.read` source feeds ``raw`` —
parquet here, `binaryFile`/json in a real ingest.

Run standalone:  python -m swisscourtrulingcorpus_spark.pipeline OUT_DIR
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from swisscourtrulingcorpus_spark.plans.datasets_extra import (
    doc2doc_ir_dataset,
    law_area_dataset,
    regeste_dataset,
)
from swisscourtrulingcorpus_spark.plans.domain_pipeline import (
    coverage_report,
    criticality_dataset,
    judgment_dataset,
    pretraining_dataset,
    run_extraction_pipeline,
)
from swisscourtrulingcorpus_spark.sources.manifest import (
    new_rows_only,
    processed_union,
)
from swisscourtrulingcorpus_spark.sources.sinks import write_partitioned

TABLES = (
    "decision",
    "section",
    "citation",
    "judgment",
    "composition",
    "lower_court",
    "participation",
)

_MANIFEST_KEYS = ["file_name"]


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def build_corpus(
    spark: SparkSession,
    raw: DataFrame,
    out_dir: str,
    incremental: bool = True,
) -> dict[str, int]:
    """Materialize the domain tables from a raw landing-zone batch.

    With ``incremental=True`` (the reference's process_new_files_only),
    already-manifested file_names are anti-joined away and the new rows
    APPEND to the existing tables; a rerun over an unchanged landing
    zone is a no-op.  Returns cumulative per-table row counts (all
    zeros when nothing was new).
    """
    manifest = _read_manifest(spark, out_dir) if incremental else None
    batch = new_rows_only(raw, manifest, _MANIFEST_KEYS)
    counts: dict[str, int] = {}
    if batch.isEmpty():
        return {t: 0 for t in TABLES}
    tables = run_extraction_pipeline(batch)
    mode = "append" if (incremental and manifest is not None) else "overwrite"
    for name in TABLES:
        df = tables[name]
        df.write.mode(mode).parquet(os.path.join(out_dir, name))
        counts[name] = spark.read.parquet(os.path.join(out_dir, name)).count()
    new_manifest = processed_union(
        manifest, batch.select(*_MANIFEST_KEYS), _MANIFEST_KEYS
    )
    # write via a temp path: the new manifest reads the old one
    tmp = _manifest_path(out_dir) + "_tmp"
    new_manifest.write.mode("overwrite").parquet(tmp)
    final = _manifest_path(out_dir)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(final)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return counts


def build_corpus_from_landing_zone(
    spark: SparkSession,
    root: str,
    out_dir: str,
    incremental: bool = True,
) -> dict[str, int]:
    """The FULL `python -m scrc.main` counterpart in one call: raw
    landing-zone FILES (scraper layout: per-doc json metadata +
    html/pdf payload) → binaryFile scan → real HTML/PDF text
    extraction (`sources/ingest.py`) → the extraction DAG → domain
    tables (VERDICT r04 item 8).  Incremental semantics compose: the
    ingest emits every document, and :func:`build_corpus`'s file_name
    manifest anti-joins the already-processed ones away, so a rerun
    over an unchanged tree is a no-op without re-extracting text.
    """
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.sources.ingest import ingest_landing_zone

    docs = ingest_landing_zone(spark, root)
    raw = docs.select(
        F.col("name").alias("file_name"),
        "spider",
        F.coalesce(
            F.col("chamber"), F.concat_ws("_", "spider", F.lit("001"))
        ).alias("chamber"),
        F.to_date("datum").alias("date"),
        F.col("text").alias("raw_text"),
    )
    return build_corpus(spark, raw, out_dir, incremental=incremental)


def load_tables(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Re-open the materialized domain tables (the inter-stage IR)."""
    return {
        name: spark.read.parquet(os.path.join(out_dir, name))
        for name in TABLES
    }


def build_datasets(
    spark: SparkSession, out_dir: str, leading: DataFrame | None = None
) -> dict[str, int]:
    """Run the dataset creators (§2.9) over the materialized tables and
    write each as a split-partitioned export.  Returns rows per dataset.
    """
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import (
        leading_rulings_df,
    )

    tables = load_tables(spark, out_dir)
    if leading is None:
        leading = leading_rulings_df(spark)
    creators: dict[str, DataFrame] = {
        "judgment_prediction": judgment_dataset(tables),
        "criticality": criticality_dataset(tables, leading),
        "pretraining": pretraining_dataset(tables),
        "doc2doc_ir": doc2doc_ir_dataset(tables),
        "regeste": regeste_dataset(tables),
        "law_area": law_area_dataset(tables),
    }
    counts: dict[str, int] = {}
    for name, df in creators.items():
        dest = os.path.join(out_dir, "datasets", name)
        part = ["split"] if "split" in df.columns else None
        write_partitioned(df, dest, partition_by=part, fmt="json",
                          compression="gzip")
        counts[name] = spark.read.json(dest).count()
    coverage_report(tables).write.mode("overwrite").parquet(
        os.path.join(out_dir, "reports", "coverage")
    )
    return counts


def main() -> None:  # pragma: no cover - thin CLI
    import sys

    from swisscourtrulingcorpus_spark.session import get_spark
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import (
        raw_corpus_df,
    )

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scrc_spark_corpus"
    spark = get_spark(app_name="corpus-build")
    raw = raw_corpus_df(spark, int(os.environ.get("SCRC_N_DOCS", "1000")))
    print("tables:", build_corpus(spark, raw, out_dir))
    print("datasets:", build_datasets(spark, out_dir))
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
