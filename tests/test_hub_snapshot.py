"""Real-schema S13 path (VERDICT r05 item 9).

The stand-in fixtures (`sources/domain_fixtures.py`) run the pipeline
offline; these tests run the SAME criticality path over a committed
parquet snapshot carrying the actual hub column schema
(`rcds/swiss_leading_decisions` / `rcds/swiss_legislation` as consumed
by the reference — `dataset_creator.py:197-227`,
`doc2doc_ir_dataset_creator.py:120-135`), so schema drift between the
fixtures and the real datasets is caught here, not at a user's site.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.sources.hub_snapshot import (
    SnapshotSchemaError,
    law_abbreviations_from_snapshot,
    leading_rulings_from_snapshot,
)

_RES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "swisscourtrulingcorpus_spark",
    "resources",
)


@pytest.fixture(scope="module")
def rulings_snapshot(spark):
    return spark.read.parquet(os.path.join(_RES, "leading_decisions_snapshot.parquet"))


@pytest.fixture(scope="module")
def legislation_snapshot(spark):
    return spark.read.parquet(os.path.join(_RES, "swiss_legislation_snapshot.parquet"))


def test_snapshot_carries_real_consumed_schema(rulings_snapshot, legislation_snapshot):
    """The committed snapshots must expose exactly the columns/types
    the reference consumes — if someone regenerates them with drifted
    names, this is the failure point."""
    rd = dict(rulings_snapshot.dtypes)
    assert rd["decision_id"] == "string"
    assert rd["file_number"] == "string"
    ld = dict(legislation_snapshot.dtypes)
    for col in ("canton", "language", "abbreviation", "sr_number", "uuid", "pdf_content"):
        assert ld[col] == "string", (col, ld.get(col))


def test_filter_rulings_semantics(spark, rulings_snapshot):
    """file_number parse mirrors the reference's filter_rulings: only
    4-part BGE_<year>_<vol>_<page> rows survive; year/page are ints."""
    parsed = leading_rulings_from_snapshot(rulings_snapshot)
    n_snapshot = rulings_snapshot.count()
    n_parsed = parsed.count()
    assert n_parsed == n_snapshot - 1  # the malformed row drops
    row = parsed.where(F.col("ruling_id") == "BGE_120_II_80").collect()[0]
    assert (row["year"], row["volume"], row["start_page"]) == (120, "II", 80)


def test_criticality_path_over_real_schema_matches_standin(spark):
    """The full criticality dataset over the REAL-schema snapshot is
    row-identical to the stand-in fixture path — the snapshot covers
    the same (year, volume, page) lattice, so any difference is
    adapter/schema drift, not data."""
    from swisscourtrulingcorpus_spark.plans.domain_pipeline import (
        criticality_dataset,
        run_extraction_pipeline,
    )
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import (
        leading_rulings_df,
        raw_corpus_df,
    )

    tables = run_extraction_pipeline(raw_corpus_df(spark, 60))
    snapshot = spark.read.parquet(
        os.path.join(_RES, "leading_decisions_snapshot.parquet")
    )
    via_snapshot = criticality_dataset(
        tables, leading_rulings_from_snapshot(snapshot)
    )
    via_standin = criticality_dataset(tables, leading_rulings_df(spark))
    got = sorted(map(tuple, via_snapshot.collect()))
    want = sorted(map(tuple, via_standin.collect()))
    assert got == want
    assert len(got) > 0


def test_legislation_filter_semantics(legislation_snapshot):
    laws = law_abbreviations_from_snapshot(legislation_snapshot)
    rows = {r["abbreviation"]: r for r in laws.collect()}
    # stripped, federal-only, multi-char only
    assert set(rows) == {"ZGB", "OR", "CO"}
    assert rows["ZGB"]["sr_number"] == "210"


def test_schema_drift_raises(spark, rulings_snapshot):
    """A snapshot with a renamed required column must fail loudly."""
    drifted = rulings_snapshot.withColumnRenamed("file_number", "fileNumber")
    with pytest.raises(SnapshotSchemaError, match="file_number"):
        leading_rulings_from_snapshot(drifted)
    # wrong type fails too
    retyped = rulings_snapshot.withColumn("decision_id", F.lit(1))
    with pytest.raises(SnapshotSchemaError, match="decision_id"):
        leading_rulings_from_snapshot(retyped)


def test_load_hub_snapshot_one_call_path(spark):
    """VERDICT r06 item 8: the user-complete S13 entry — one call from
    a parquet path to the adapted internal shape, for both datasets."""
    from swisscourtrulingcorpus_spark.sources.hub_snapshot import (
        load_hub_snapshot,
    )

    rulings = load_hub_snapshot(
        spark,
        os.path.join(_RES, "leading_decisions_snapshot.parquet"),
        "leading_decisions",
    )
    assert set(rulings.columns) == {"ruling_id", "year", "volume", "start_page"}
    assert rulings.count() > 0

    laws = load_hub_snapshot(
        spark,
        os.path.join(_RES, "swiss_legislation_snapshot.parquet"),
        "legislation",
    )
    assert {r["abbreviation"] for r in laws.collect()} == {"ZGB", "OR", "CO"}

    # live-hub URLs are documented, not silently mis-read
    with pytest.raises(ValueError, match="download"):
        load_hub_snapshot(spark, "https://huggingface.co/x", "legislation")
    with pytest.raises(ValueError, match="unknown hub dataset"):
        load_hub_snapshot(spark, os.path.join(_RES, "x"), "nope")
