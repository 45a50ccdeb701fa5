"""S3 HTML text extraction + the CH_BGer html-citation path (E4).

The reference uses BeautifulSoup (`text_to_database.py:238-254` for
text; `citation_extracting_functions.py:55-76` for the CH_BGer
citation spans: ``<span class="artref">`` = law cites, ``<a
class="bgeref_id">`` = ruling cites).  bs4 isn't in this container —
the stdlib ``html.parser`` covers both uses, so this path is REAL, not
stubbed: script/style-aware text collection, paragraph segmentation on
block elements, and class-attribute citation harvesting.

All functions are pure per-document Python wrapped in Arrow-batched
pandas_udfs (map-side only).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "table", "section",
}
_SKIP_TAGS = {"script", "style", "head"}


class _TextCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


class _CitationCollector(HTMLParser):
    """CH_BGer markup: law cites in <span class="artref">, ruling cites
    in <a class="bgeref_id" href=...>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.citations: list[dict] = []
        self._active: dict | None = None

    def handle_starttag(self, tag, attrs):
        attr = dict(attrs)
        cls = attr.get("class", "")
        if tag == "span" and "artref" in cls:
            self._active = {"type": "law", "url": attr.get("href"), "text": ""}
        elif tag == "a" and "bgeref_id" in cls:
            self._active = {"type": "ruling", "url": attr.get("href"), "text": ""}

    def handle_endtag(self, tag):
        if self._active is not None and tag in ("span", "a"):
            self._active["text"] = self._active["text"].strip()
            if self._active["text"]:
                self.citations.append(self._active)
            self._active = None

    def handle_data(self, data):
        if self._active is not None:
            self._active["text"] += data


def html_to_text_py(html: str | None) -> str | None:
    if html is None:
        return None
    collector = _TextCollector()
    collector.feed(html)
    text = "".join(collector.parts)
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def html_paragraphs_py(html: str | None) -> list[str] | None:
    """F3 html→paragraph list (`main_utils.py:52-61`)."""
    text = html_to_text_py(html)
    if text is None:
        return None
    return [p for p in text.split("\n") if p]


def html_citations_py(html: str | None) -> list[dict] | None:
    if html is None:
        return None
    collector = _CitationCollector()
    collector.feed(html)
    # dedup by (type, text) preserving first occurrence, like the
    # reference's span harvesting
    seen: set[tuple] = set()
    out = []
    for c in collector.citations:
        key = (c["type"], c["text"])
        if key not in seen:
            seen.add(key)
            out.append(c)
    return out


HTML_CITATION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("type", StringType()),
            StructField("text", StringType()),
            StructField("url", StringType()),
        ]
    )
)


@pandas_udf(StringType())
def html_to_text_udf(html: pd.Series) -> pd.Series:
    return html.map(html_to_text_py)


@pandas_udf(ArrayType(StringType()))
def html_paragraphs_udf(html: pd.Series) -> pd.Series:
    return pd.Series([html_paragraphs_py(h) for h in html], dtype=object)


@pandas_udf(HTML_CITATION_SCHEMA)
def html_citations_udf(html: pd.Series) -> pd.Series:
    return pd.Series([html_citations_py(h) for h in html], dtype=object)
