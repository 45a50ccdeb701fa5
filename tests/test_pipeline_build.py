"""End-to-end corpus build (§3.1): extraction DAG → parquet IR →
incremental rerun → dataset exports, mirroring `python -m scrc.main`."""

from __future__ import annotations

from swisscourtrulingcorpus_spark.pipeline import (
    TABLES,
    build_corpus,
    build_datasets,
    load_tables,
)
from swisscourtrulingcorpus_spark.sources.domain_fixtures import raw_corpus_df


def test_build_corpus_incremental_and_datasets(spark, tmp_path):
    out = str(tmp_path / "corpus")
    raw_small = raw_corpus_df(spark, 300)

    counts1 = build_corpus(spark, raw_small, out)
    assert counts1["decision"] == 300
    assert all(counts1[t] > 0 for t in ("section", "judgment"))

    # unchanged landing zone: nothing new, tables untouched
    counts2 = build_corpus(spark, raw_small, out)
    assert all(v == 0 for v in counts2.values())
    assert load_tables(spark, out)["decision"].count() == 300

    # 100 new files appear: only they are processed, tables grow
    counts3 = build_corpus(spark, raw_corpus_df(spark, 400), out)
    assert counts3["decision"] == 400
    for t in TABLES:
        assert counts3[t] >= counts1[t]

    ds_counts = build_datasets(spark, out)
    assert ds_counts["judgment_prediction"] > 0
    assert ds_counts["pretraining"] > 0

    # exports are split-partitioned on disk
    import glob

    assert glob.glob(str(tmp_path / "corpus/datasets/judgment_prediction/split=*"))

    # manifest staging dir is cleaned up after the rewrite
    assert not (tmp_path / "corpus/_manifest_tmp").exists()
