"""External-corpus TEI ingest (reference `scrc/preprocessors/
external_corpora/`: `external_corpus_processor.py:13-101`,
`jureko_processor.py` — the Jureko legal corpus arrives as TEI XML
files whose header carries type/title/file-number/date and whose body
is the document text).

The reference walks files driver-side with glob + a TeiReader and
appends rows to Postgres in chunks.  Spark-first, the corpus lands as
a DataFrame of raw XML strings (however ingested: binaryFile scan,
wholetext, a manifest join) and the TEI parse runs as an Arrow-batched
``mapInPandas`` over executors — the same distribution shape as the
HTML/PDF extractors, so a million TEI files parse with cluster
parallelism instead of a driver loop.  Downstream, the existing
counter/roll-up operators (A3/A4) apply unchanged — which is the whole
point of the reference's external-corpus pipeline.

Parsing is stdlib ElementTree, namespace-agnostic (TEI files come both
namespaced and not), with the reference's field selection:
``biblStruct/@type`` (grouping table), ``titleStmt/title``, the first
``analytic/idno`` (Aktenzeichen / file number), ``analytic/date``
(``NoDate`` → null, as `jureko_processor.py:63-66`), and the
whitespace-joined text of ``<text>``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

TEI_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("doc_type", StringType()),
        StructField("title", StringType()),
        StructField("file_number", StringType()),
        StructField("date", StringType()),
        StructField("text", StringType()),
    ]
)


def _local(tag: str) -> str:
    """Tag name with any XML namespace stripped."""
    return tag.rsplit("}", 1)[-1]


def _find_first(root: ET.Element, path: list[str]) -> ET.Element | None:
    """Namespace-agnostic descent: at each step, the first child whose
    local name matches."""
    node: ET.Element | None = root
    for want in path:
        if node is None:
            return None
        node = next((c for c in node if _local(c.tag) == want), None)
    return node


def parse_tei_string(xml: str, source_file: str = "") -> dict:
    """One TEI document → the reference's row shape.  Malformed XML
    yields a row with null fields (quarantine-by-null, the repo-wide
    extractor convention) rather than failing the batch."""
    out = {
        "source_file": source_file,
        "doc_type": None,
        "title": None,
        "file_number": None,
        "date": None,
        "text": None,
    }
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return out
    header = _find_first(root, ["teiHeader", "fileDesc"])
    if header is not None:
        title = _find_first(header, ["titleStmt", "title"])
        if title is not None:
            out["title"] = (title.text or "").strip() or None
        bibl = _find_first(header, ["sourceDesc", "biblStruct"])
        if bibl is not None:
            out["doc_type"] = bibl.get("type")
            analytic = _find_first(bibl, ["analytic"])
            if analytic is not None:
                idno = next(
                    (c for c in analytic if _local(c.tag) == "idno"), None
                )
                if idno is not None:
                    out["file_number"] = (idno.text or "").strip() or None
                date = next(
                    (c for c in analytic if _local(c.tag) == "date"), None
                )
                if date is not None:
                    d = (date.text or "").strip()
                    out["date"] = None if d in ("", "NoDate") else d
    body = next((c for c in root if _local(c.tag) == "text"), None)
    if body is not None:
        # join text NODES with a space (adjacent <p> elements carry no
        # whitespace between them in the serialization), then collapse
        out["text"] = " ".join(" ".join(body.itertext()).split()) or None
    return out


def tei_corpus_df(df: DataFrame, xml_col: str, file_col: str) -> DataFrame:
    """Distributed TEI parse: raw-XML DataFrame → structured corpus
    table.  Arrow-batched ``mapInPandas``; the wide XML column never
    survives past the map (only parsed fields flow downstream), so any
    later shuffle moves structured rows, not documents."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                [
                    parse_tei_string(x, source_file=f)
                    for x, f in zip(pdf[xml_col], pdf[file_col])
                ],
                columns=[f.name for f in TEI_SCHEMA.fields],
            )

    return df.mapInPandas(batches, TEI_SCHEMA)
