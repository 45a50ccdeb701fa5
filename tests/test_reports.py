"""Tests for the report computations (A10-A13) and the Excel/CSV sink."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F


def test_attribute_distribution(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.reports import attribute_distribution
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    rep = attribute_distribution(load_table(spark, sf_dir, "orders"), "o_orderstatus")
    rows = rep.collect()
    assert abs(sum(r.pct for r in rows) - 100.0) < 1e-9
    assert {r.o_orderstatus for r in rows} == {"F", "O", "P"}


def test_input_length_stats(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.reports import input_length_stats
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    stats = input_length_stats(
        load_table(spark, sf_dir, "documents"), "n_chars", clip_at=400
    ).first()
    assert stats.max <= 400  # clipped
    assert stats.p25 <= stats.p50 <= stats.p75


def test_token_bucket_histogram(spark):
    from swisscourtrulingcorpus_spark.plans.reports import token_bucket_histogram

    df = spark.createDataFrame(
        [(0,), (511,), (512,), (1024,), (8191,), (8192,), (99999,)], ["n"]
    )
    rep = {r.bucket_range: r.cnt for r in token_bucket_histogram(df, "n").collect()}
    assert rep["[0,512)"] == 2
    assert rep["[512,1024)"] == 1
    assert rep["[1024,2048)"] == 1
    assert rep["[4096,8192)"] == 1
    assert rep[">=8192"] == 2


def test_excel_sink_fallback(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.reports import (
        attribute_distribution,
        export_report_excel,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    rep = attribute_distribution(load_table(spark, sf_dir, "region"), "r_name")
    path = os.path.join(tempfile.mkdtemp(prefix="rep_"), "out.xlsx")
    ok = export_report_excel(rep, path)
    # a real .xlsx always lands now (pandas engine or stdlib OOXML)
    assert ok and os.path.exists(path)
    from swisscourtrulingcorpus_spark.sources.ooxml import read_xlsx_cells

    cells = read_xlsx_cells(path)
    rep_rows = rep.collect()
    assert cells[0] == list(rep.columns)
    assert {tuple(r) for r in cells[1:]} == {
        tuple(float(v) if isinstance(v, (int, float)) else v for v in row)
        for row in rep_rows
    }


def test_ooxml_writers_roundtrip(tmp_path):
    """Stdlib OOXML writers produce parseable, value-exact parts."""
    from swisscourtrulingcorpus_spark.sources.ooxml import (
        read_docx_paragraphs,
        read_xlsx_cells,
        write_docx,
        write_xlsx,
    )

    xp = str(tmp_path / "t.xlsx")
    write_xlsx(xp, ["name", "n"], [["a & <b>", 3], ["ü", 2.5], [None, None]])
    got = read_xlsx_cells(xp)
    assert got[0] == ["name", "n"]
    assert got[1] == ["a & <b>", 3.0]
    assert got[2] == ["ü", 2.5]

    dp = str(tmp_path / "t.docx")
    write_docx(
        dp,
        [
            {"text": "decision X", "style": "Heading1"},
            {"text": "outcome: approval", "bold": True, "highlight": "yellow"},
            {"text": "plain <&> body"},
        ],
    )
    paras = read_docx_paragraphs(dp)
    assert paras[0] == ("Heading1", False, "decision X")
    assert paras[1] == (None, True, "outcome: approval")
    assert paras[2] == (None, False, "plain <&> body")


def test_verification_docs_sink(spark, tmp_path):
    """S15: deterministic sample rendered to a reviewable file with
    section delimiters + judgment outcome; same sample on every run."""
    from swisscourtrulingcorpus_spark.plans.domain_pipeline import (
        run_extraction_pipeline,
    )
    from swisscourtrulingcorpus_spark.plans.reports import (
        export_verification_docs,
    )
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import raw_corpus_df

    tables = run_extraction_pipeline(raw_corpus_df(spark, 120))
    p1 = export_verification_docs(tables, str(tmp_path / "v1"), n=10)
    p2 = export_verification_docs(tables, str(tmp_path / "v2"), n=10)
    t1, t2 = open(p1).read(), open(p2).read()
    assert t1 == t2  # deterministic sample + render
    assert t1.count("# decision ") == 10
    assert "## [rulings]" in t1
    assert "**judgment outcome:" in t1
    # the real .docx twin: heading per decision, highlighted outcome run
    from swisscourtrulingcorpus_spark.sources.ooxml import read_docx_paragraphs

    paras = read_docx_paragraphs(p1.replace(".md", ".docx"))
    headings = [t for s, _, t in paras if s == "Heading1"]
    assert len(headings) == 10 and all(t.startswith("decision ") for t in headings)
    assert any(b and t.startswith("judgment outcome:") for _, b, t in paras)


def test_labels_json_and_kaggle_export(spark, tmp_path):
    """S11: labels.json id2label/label2id over distinct labels;
    kaggle solution + sampleSubmission csvs with deterministic order."""
    import json

    from swisscourtrulingcorpus_spark.sources.sinks import (
        export_kaggle_files,
        export_labels_json,
    )

    df = spark.createDataFrame(
        [(1, "approval"), (2, "dismissal"), (3, "approval"), (4, None)],
        "decision_id long, label string",
    )
    mapping = export_labels_json(df, "label", str(tmp_path / "labels.json"))
    assert mapping["id2label"] == {"0": "approval", "1": "dismissal"}
    assert json.load(open(tmp_path / "labels.json"))["label2id"] == {
        "approval": 0, "dismissal": 1
    }

    sol, sub = export_kaggle_files(df, "decision_id", "label", str(tmp_path / "k"))
    sol_df = spark.read.option("header", True).csv(sol)
    assert sol_df.columns == ["Id", "Expected"]
    assert sol_df.count() == 4
    sub_df = spark.read.option("header", True).csv(sub)
    assert {r.Predicted for r in sub_df.where(F.col("Predicted").isNotNull()).collect()} == {"approval"}


def test_jsonl_export_roundtrip(spark, sf_dir, tmp_path):
    """S10: the split-partitioned compressed JSONL export must read back
    value-identical (schema + rows survive the codec and partition
    layout)."""
    import pyspark.sql.functions as F

    from swisscourtrulingcorpus_spark.sources.catalog import load_table
    from swisscourtrulingcorpus_spark.sources.sinks import write_partitioned

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.when(F.col("doc_id") % 10 < 8, "train")
        .when(F.col("doc_id") % 10 < 9, "validation")
        .otherwise("test")
        .alias("split"),
    )
    path = str(tmp_path / "export")
    write_partitioned(docs, path, ["split"], fmt="json", compression="gzip")

    back = spark.read.json(path)
    assert back.count() == docs.count()
    # partition column round-trips as a directory key
    assert set(r.split for r in back.select("split").distinct().collect()) == {
        "train", "validation", "test"
    }
    # values identical (join on id, compare text)
    bad = (
        back.alias("b")
        .join(docs.alias("d"), "doc_id")
        .where(F.col("b.text") != F.col("d.text"))
    )
    assert bad.count() == 0


def test_kaggle_export_empty_and_allnull_labels(spark, tmp_path):
    """S11 guard: an empty input (or all-null labels) must not raise —
    the baseline Predicted degrades to null."""
    from swisscourtrulingcorpus_spark.sources.sinks import export_kaggle_files

    empty = spark.createDataFrame([], "decision_id long, label string")
    sol, sub = export_kaggle_files(empty, "decision_id", "label", str(tmp_path / "e"))
    assert spark.read.option("header", True).csv(sub).count() == 0

    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "decision_id long, label string"
    )
    sol, sub = export_kaggle_files(allnull, "decision_id", "label", str(tmp_path / "n"))
    sub_df = spark.read.option("header", True).csv(sub)
    assert sub_df.count() == 2
    assert sub_df.where(F.col("Predicted").isNotNull()).count() == 0


def test_bar_chart_svg_sink(spark, tmp_path):
    """Report chart sink: aggregated table -> self-contained SVG."""
    import xml.etree.ElementTree as ET

    from swisscourtrulingcorpus_spark.plans.reports import export_bar_chart_svg

    df = spark.createDataFrame(
        [("approval", 120), ("dismissal", 80), ("write_off", 15)],
        "label string, n long",
    )
    path = export_bar_chart_svg(
        df, "label", "n", str(tmp_path / "labels.svg"), title="Outcomes"
    )
    root = ET.parse(path).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f"{ns}rect")
    assert len(rects) == 3
    heights = [float(r.get("height")) for r in rects]
    # bar heights proportional to values (120 > 80 > 15)
    assert heights[0] > heights[1] > heights[2]
    texts = [t.text for t in root.findall(f"{ns}text")]
    assert "Outcomes" in texts and "approval" in texts
