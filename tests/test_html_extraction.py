"""Golden tests for the stdlib-HTMLParser S3/E4 html path."""

from __future__ import annotations

from swisscourtrulingcorpus_spark.extraction.html import (
    html_citations_py,
    html_paragraphs_py,
    html_to_text_py,
)

HTML_DOC = """<html><head><title>x</title><style>p {color: red}</style></head>
<body>
<h1>Urteil vom 3. Mai 2019</h1>
<p>Besetzung: Bundesrichter Huber, Pr&auml;sident</p>
<div>Sachverhalt</div>
<p>A. Die Beschwerdef&uuml;hrerin reichte Klage ein.</p>
<p>Nach <a class="bgeref_id" href="https://example/133-II-249">BGE 133 II 249</a>
und <span class="artref">Art. 95 Abs. 2 BGG</span> gilt:</p>
<script>alert("nope")</script>
<p>Demnach erkennt das Bundesgericht:</p>
<p>1. Die Beschwerde wird abgewiesen.</p>
</body></html>"""


def test_html_to_text_strips_script_style_and_entities():
    text = html_to_text_py(HTML_DOC)
    assert "Präsident" in text            # entity decoded
    assert "alert" not in text            # script skipped
    assert "color: red" not in text       # style skipped
    assert "abgewiesen" in text


def test_html_paragraphs():
    paras = html_paragraphs_py(HTML_DOC)
    assert paras[0].startswith("Urteil vom")
    assert any(p == "Sachverhalt" for p in paras)
    assert all(p.strip() for p in paras)


def test_html_citations_classes():
    cits = html_citations_py(HTML_DOC)
    by_type = {c["type"]: c for c in cits}
    assert by_type["ruling"]["text"] == "BGE 133 II 249"
    assert by_type["ruling"]["url"] == "https://example/133-II-249"
    assert by_type["law"]["text"] == "Art. 95 Abs. 2 BGG"


def test_html_none_and_malformed():
    assert html_to_text_py(None) is None
    # malformed html must not raise — parser is forgiving
    assert "text" in html_to_text_py("<p>text<div</p>")


def test_html_pipeline_distributed(spark):
    """html_raw -> text -> sections -> judgment, end to end (the S3 ->
    E2 -> E3 -> E5 chain on an HTML source)."""
    import pyspark.sql.functions as F

    from swisscourtrulingcorpus_spark.extraction import (
        extract_judgments_udf,
        split_sections_udf,
    )
    from swisscourtrulingcorpus_spark.extraction.html import html_to_text_udf

    df = spark.createDataFrame([(HTML_DOC,)], ["html_raw"])
    sections = df.select(
        split_sections_udf(
            html_to_text_udf("html_raw"), F.lit("de")
        ).alias("secs")
    ).select(F.explode("secs").alias("s"))
    rulings = sections.where(F.col("s.section") == "rulings").select("s.text")
    out = rulings.select(
        extract_judgments_udf("text", F.lit("de")).alias("j")
    ).first()
    assert out.j == ["dismissal"]
