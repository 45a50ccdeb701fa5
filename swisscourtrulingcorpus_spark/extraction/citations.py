"""E4 CitationExtractor — text → typed ruling/law citations.

Reference behavior (`scrc/preprocessors/extractors/citation_extractor.py`
+ `citation_extraction/__init__.py:7-77`): combined regexes find
citation spans; candidates are parsed into value objects
(RulingCitation year/volume/page, `scrc/data_classes/ruling_citation.py:
5-60`; LawCitation article/paragraph/abbreviation, `law_citation.py:
9-80`) and candidates that fail to parse are DROPPED (validity filter,
`check_if_convertible`).

Output: ``array<struct<...>>`` rows ready for explode — the UDTF shape
(SURVEY.md §2.11).  Ruling citations keep (year, volume, page) ints so
the as-of page-snap join (J6) can consume them relationally.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# BGE/ATF/DTF = the same reporter in de/fr/it (`ruling_citation.py:12-20`)
_RULING_RX = re.compile(
    r"\b(?:BGE|ATF|DTF)\s+(\d{1,3})\s+(I{1,3}|IV|V|Ia|Ib)\s+(\d{1,4})\b"
)
# Art. 95 [Abs. 2] BGG — article, optional paragraph, abbreviation
_LAW_RX = re.compile(
    r"\bArt\.\s*(\d+[a-z]?)\s*(?:Abs\.\s*(\d+)\s*)?([A-ZÄÖÜ][A-Za-zÄÖÜäöü]{1,15})\b"
)

CITATION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("type", StringType()),
            StructField("text", StringType()),
            StructField("year", IntegerType()),
            StructField("volume", StringType()),
            StructField("page", IntegerType()),
            StructField("article", StringType()),
            StructField("paragraph", IntegerType()),
            StructField("law", StringType()),
        ]
    )
)


def extract_citations_py(text: str | None) -> list[dict] | None:
    if text is None:
        return None
    out: list[dict] = []
    seen: set[str] = set()
    for m in _RULING_RX.finditer(text):
        span = m.group(0)
        if span in seen:
            continue  # dedup, like the reference's found-spans set
        seen.add(span)
        year, volume, page = int(m.group(1)), m.group(2), int(m.group(3))
        if not (1 <= year <= 160):  # validity filter: parseable as BGE year
            continue
        out.append(
            {
                "type": "ruling",
                "text": span,
                "year": year,
                "volume": volume,
                "page": page,
                "article": None,
                "paragraph": None,
                "law": None,
            }
        )
    for m in _LAW_RX.finditer(text):
        span = m.group(0)
        if span in seen:
            continue
        seen.add(span)
        out.append(
            {
                "type": "law",
                "text": span,
                "year": None,
                "volume": None,
                "page": None,
                "article": m.group(1),
                "paragraph": int(m.group(2)) if m.group(2) else None,
                "law": m.group(3),
            }
        )
    return out


@pandas_udf(CITATION_SCHEMA)
def extract_citations_udf(text: pd.Series) -> pd.Series:
    return pd.Series([extract_citations_py(t) for t in text], dtype=object)


# --- D4 NER-span variant (`citation_extraction_dataset_creator.py`):
# character-level spans for token-classification training data ---------

NER_SPAN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("label", StringType()),
        ]
    )
)


def citation_spans_py(text: str | None) -> list[dict] | None:
    """All citation character spans with BIO-style labels (every
    occurrence, not deduped — NER training needs each mention)."""
    if text is None:
        return None
    spans = [
        {"start": m.start(), "end": m.end(), "label": "RULING"}
        for m in _RULING_RX.finditer(text)
    ] + [
        {"start": m.start(), "end": m.end(), "label": "LAW"}
        for m in _LAW_RX.finditer(text)
    ]
    return sorted(spans, key=lambda s: (s["start"], s["end"]))


@pandas_udf(NER_SPAN_SCHEMA)
def citation_spans_udf(text: pd.Series) -> pd.Series:
    return pd.Series([citation_spans_py(t) for t in text], dtype=object)
