"""E3 SectionSplitter — the order-dependent state machine.

Reference behavior (`scrc/preprocessors/extractors/section_splitter.py:
26-174` + the generic engine in `spider_specific/
section_splitting_functions.py:1034-1088`): a document is a list of
paragraphs; per-court regex markers announce sections; the splitter
walks paragraphs sequentially and ADVANCES the current section when a
*later* section's marker matches (never goes back), accumulating
paragraphs into the current section.  FULL_TEXT is everything.

SURVEY.md §7.3 calls this out as a hard part: it must stay a
per-document sequential fold — do NOT relationalize it.  So: a
pandas_udf mapping text → array<struct<section:string, text:string>>,
then a built-in ``explode`` to section rows.  Marker tables are plain
data (fresh, modeled on the generic German marker shapes at
`section_splitting_functions.py:33-49`, plus fr/it equivalents), keyed
by language, broadcast with the closure.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

SECTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("section", StringType()),
            StructField("text", StringType()),
        ]
    )
)

# Canonical section order (Section enum, `scrc/enums/section.py:4-11`).
SECTION_ORDER = ["header", "facts", "considerations", "rulings", "footer"]

# Per-spider overrides (the reference's spider-specific dispatch,
# `abstract_extractor.py:167-183`: function named == spider, else the
# generic default).  A spider entry may override the section ORDER (the
# OW-style court that puts rulings before considerations,
# `section_splitting_functions.py:772-790`) and/or add marker patterns.
SPIDER_OVERRIDES: dict[str, dict] = {
    "OW_Custom": {
        "order": ["header", "facts", "rulings", "considerations", "footer"],
    },
}

# Fresh marker data in the reference's *shape*: language -> section ->
# list of paragraph-start regexes.
SECTION_MARKERS: dict[str, dict[str, list[str]]] = {
    "de": {
        "facts": [r"^Sachverhalt", r"^A\.[\s_]", r"^Ausgangslage"],
        "considerations": [
            r"^Erw[äa]gung(en)?",
            r"^Aus den Erw[äa]gungen",
            r"^Das Gericht zieht in Erw[äa]gung",
        ],
        "rulings": [r"^Demnach erkennt", r"^Demnach beschliesst", r"^Dispositiv"],
        "footer": [r"^Rechtsmittelbelehrung", r"^Im Namen des", r"^Mitteilung an"],
    },
    "fr": {
        "facts": [r"^En fait", r"^Faits\b", r"^A\.[\s_]"],
        "considerations": [r"^En droit", r"^Consid[ée]rant", r"^Le Tribunal considère"],
        "rulings": [r"^Par ces motifs", r"^Prononce\b"],
        "footer": [r"^Voie de recours", r"^Au nom de"],
    },
    "it": {
        "facts": [r"^In fatto", r"^Ritenuto in fatto"],
        "considerations": [r"^In diritto", r"^Considerando"],
        "rulings": [r"^Per questi motivi"],
        "footer": [r"^Contro la presente", r"^In nome del"],
    },
}


def _compiled(lang: str) -> dict[str, list[re.Pattern]]:
    markers = SECTION_MARKERS.get(lang, SECTION_MARKERS["de"])
    return {s: [re.compile(p) for p in pats] for s, pats in markers.items()}


def split_sections_py(
    text: str | None, lang: str | None, spider: str | None = None
) -> list[dict]:
    """The sequential fold: current section starts at 'header'; a
    paragraph matching a STRICTLY LATER section's marker advances to it
    (the no-backtracking rule of `associate_sections`); every paragraph
    accrues to the current section.  ``spider`` selects per-spider
    overrides (section order / extra markers) — the dispatch the
    reference does via same-named functions, here via broadcast config.
    """
    if text is None:
        return []
    override = SPIDER_OVERRIDES.get(spider or "", {})
    order = override.get("order", SECTION_ORDER)
    compiled = _compiled(lang or "de")
    for sec, pats in override.get("markers", {}).items():
        compiled.setdefault(sec, [])
        compiled[sec] = [re.compile(p) for p in pats] + compiled[sec]
    paragraphs = [p.strip() for p in re.split(r"\n\s*\n|\n", text) if p.strip()]
    current = 0  # index into order
    buckets: dict[str, list[str]] = {s: [] for s in order}
    for para in paragraphs:
        # earliest later section whose marker matches wins (forward scan,
        # mirroring the reference's ordered next-section probe)
        for later_idx in range(current + 1, len(order)):
            sec = order[later_idx]
            if any(rx.search(para) for rx in compiled.get(sec, [])):
                current = later_idx
                break
        buckets[order[current]].append(para)
    out = [
        {"section": sec, "text": "\n".join(ps)}
        for sec, ps in buckets.items()
        if ps
    ]
    out.append({"section": "full_text", "text": "\n".join(paragraphs)})
    return out


@pandas_udf(SECTION_SCHEMA)
def split_sections_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    return pd.Series(
        [split_sections_py(t, lg) for t, lg in zip(text, lang)]
    )


@pandas_udf(SECTION_SCHEMA)
def split_sections_with_spider_udf(
    text: pd.Series, lang: pd.Series, spider: pd.Series
) -> pd.Series:
    """Spider-dispatching variant: per-row overrides from
    SPIDER_OVERRIDES (broadcast with the closure)."""
    return pd.Series(
        [
            split_sections_py(t, lg, sp)
            for t, lg, sp in zip(text, lang, spider)
        ]
    )
