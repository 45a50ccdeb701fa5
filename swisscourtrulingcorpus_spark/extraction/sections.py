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

# Canonical section order (Section enum, `scrc/enums/section.py:4-11`:
# FULL_TEXT, HEADER, TOPIC, FACTS, CONSIDERATIONS, RULINGS, FOOTER).
SECTION_ORDER = ["header", "topic", "facts", "considerations", "rulings", "footer"]

# Fresh marker data in the reference's *shape*: language -> section ->
# list of paragraph regexes (searched, not anchored — markers may sit
# mid-paragraph after PDF extraction).
SECTION_MARKERS: dict[str, dict[str, list[str]]] = {
    "de": {
        "topic": [r"^Gegenstand", r"^betreffend", r"^wegen\b"],
        "facts": [r"^Sachverhalt", r"^A\.[\s_-]", r"^Ausgangslage", r"Nach Einsicht"],
        "considerations": [
            r"^Erw[äa]gung(en)?",
            r"^Aus den Erw[äa]gungen",
            r"zieht in Erw[äa]gung",
            r"[Ii]n Erw[äa]gung",
        ],
        "rulings": [
            r"^Demnach (erkennt|beschliesst|verfügt)",
            r"erk[ae]nnt(\s\S+){0,3}:\s*$",
            r"beschl(iesst|ossen)(\s\S+){0,3}:\s*$",
            r"verfügt(\s\S+){0,3}:\s*$",
            r"^Dispositiv",
        ],
        "footer": [r"^Rechtsmittelbelehrung", r"^Im Namen des", r"^Mitteilung an"],
    },
    "fr": {
        "topic": [r"^Objet\b"],
        "facts": [r"^En fait", r"^Faits\b", r"^A\.[\s_-]", r"^[Vv]u\s?:"],
        "considerations": [
            r"^En droit",
            r"^Consid[ée]rant",
            r"considère en droit",
            r"^Le Tribunal considère",
        ],
        "rulings": [r"^Par ces? motifs?", r"^[Pp]rononce\s?:", r"^[Oo]rdonne\s?:"],
        "footer": [r"^Voie de recours", r"^Au nom de"],
    },
    "it": {
        "topic": [r"^Oggetto\b"],
        "facts": [r"^In fatto", r"^Ritenuto in fatto", r"^[Ff]att[io]\s?:"],
        "considerations": [
            r"^In diritto",
            r"^Considerando",
            r"^Considerato",
            r"^[Dd]iritto\s?:",
        ],
        "rulings": [r"^Per questi motivi"],
        "footer": [r"^Contro la presente", r"^In nome del"],
    },
}

# Per-spider overrides (the reference's spider-specific dispatch,
# `abstract_extractor.py:167-183`: function named == spider, else the
# generic default).  A spider entry may override the section ORDER (the
# LU/OW-style courts that put rulings before considerations,
# `section_splitting_functions.py:772-790,872-893`) and/or define its
# own marker table ``{lang: {section: [regexes]}}``.  Semantics: for a
# SECTION the spider defines, its patterns REPLACE the generic ones
# (each reference spider function carries its own full dict); sections
# the spider leaves out inherit the generic patterns, and languages the
# spider doesn't define fall back entirely to the generic table.  Both
# fallbacks deviate from the reference — which carries no markers for
# such sections and skips unknown-language documents outright
# (`valid_namespace`, :716-730) — chosen so a missing footer config or
# one unexpected language doesn't null out a whole partition.
#
# The five configs below are the reference's own largest-volume courts
# (skew list, `dataset_creator.py:424-439`), marker content rewritten
# condensed from `section_splitting_functions.py:597-643` (CH_BGer),
# `:913-945` (CH_BVGer), `:53-77` (GE_Gerichte), `:1276-1306`
# (ZH_Sozialversicherungsgericht), `:270-296,846-871` (VD_Omni /
# VD_FindInfo).
SPIDER_OVERRIDES: dict[str, dict] = {
    "OW_Custom": {
        "order": ["header", "topic", "facts", "rulings", "considerations", "footer"],
    },
    "LU_Gerichte": {
        "order": ["header", "topic", "facts", "rulings", "considerations", "footer"],
        "markers": {
            "de": {
                "rulings": [r"^Entscheid:\s*$"],
                "considerations": [r"^Aus den Erw[äa]gungen"],
            },
        },
    },
    "CH_BGer": {
        "markers": {
            "de": {
                "topic": [r"^Gegenstand", r"^betreffend", r"^Betreff", r"^wegen\b"],
                "facts": [r"Sachverhalt:", r"hat sich ergeben", r"Nach Einsicht", r"^A\.-"],
                "considerations": [r"Erw[äa]gung(en)?:", r"[Ii]n Erw[äa]gung"],
                "rulings": [
                    r"Demnach (erkennt|beschliesst|verfügt)",
                    r"erkennt d\w\w Präsident",
                    r"erk[ae]nnt(\s[\wäöü]*){0,3}:\s*$",
                    r"beschliesst(\s[\wäöü]*){0,3}:\s*$",
                    r"verfügt(\s[\wäöü]*){0,3}:\s*$",
                    r"beschlossen:",
                    r"erkennt das Eidg\. Versicherungsgericht",
                ],
            },
            "fr": {
                "topic": [r"^Objet\b"],
                "facts": [r"Faits\s?:", r"en fait et en droit", r"[Vv]u\s?:", r"^A\.-"],
                "considerations": [
                    r"Considérant en (fait et en )?droit\s?:",
                    r"[Cc]onsidérants?\s?:",
                    r"considère",
                ],
                "rulings": [r"prononce\s?:", r"Par ces? motifs?", r"ordonne\s?:"],
            },
            "it": {
                "topic": [r"^Oggetto\b"],
                "facts": [r"[Ff]att[io]\s?:"],
                "considerations": [
                    r"[Cc]onsiderando", r"[Dd]iritto\s?:", r"Visto:", r"Considerato",
                ],
                "rulings": [r"[Pp]er questi motivi"],
                "footer": [
                    # trailing "<place>, <day> <italian month> <year>" date line
                    r",\s(il\s?)?\d?\d°?\s?(gen|feb|mar|apr|mag|giu|lug|ago|set|ott|nov|dic)\w*\s?\d{2,4}\s?[A-Za-z\/]{0,7}:?\s*$",
                ],
            },
        },
    },
    "CH_BVGer": {
        "markers": {
            "de": {
                "facts": [r"Sachverhalt", r"stellt fest,"],
                "considerations": [r"zieht in Erw[äa]gung", r"stellt fest und erwägt"],
                "rulings": [r"Demnach erkennt das Bundesverwaltungsgericht"],
                "footer": [
                    r"Der vorsitzende Richter: (Der Gerichtsschreiber|Die Gerichtsschreiberin):",
                    r"Dieses Urteil geht an:",
                    r"Gegen diesen Entscheid kann innert 30 Tagen",
                    r"^Rechtsmittelbelehrung:$",
                ],
            },
            "fr": {
                "facts": [r"^Faits\b", r"stellt fest,"],
                "considerations": [r"et considérant", r"Droit :$"],
                "rulings": [r"Tribunal administratif fédéral prononce"],
                "footer": [
                    r"Indication des voies de droit\s?:",
                    r"Voies de droit:",
                    r"L[ae] (juge unique|présidente? du collège)\s?: L[ae] greffi[eè]re?\s?:",
                ],
            },
            "it": {
                "facts": [r"Fatti:", r"Ritenuto in fatto", r"Visto:?$"],
                "considerations": [
                    r"considerato in diritto:", r"Diritto:", r"e considerato",
                    r"Considerando in diritto",
                ],
                "rulings": [r"Per questi motivi, il Tribunale amministrativo federale"],
                "footer": [
                    r"(Il|La) presidente del collegio:", r"Rimedi di diritto",
                    r"Data di spedizione:",
                ],
            },
        },
    },
    "GE_Gerichte": {
        "markers": {
            "fr": {
                "facts": [r"EN FAIT", r"en fait"],
                "considerations": [r"EN DROIT", r"en droit"],
                "rulings": [r"PAR CES MOTIFS", r"LA CHAMBRE ADMINISTRATIVE"],
                "footer": [
                    r"[Ll]a [Gg]reffière", r"[Ll]e [Gg]reffier", r"Siégeant",
                    r"Voie de recours", r"Le recours doit être", r"[Ll]e [Pp]résident",
                ],
            },
            "de": {
                "facts": [r"Tatbestand", r"Sachverhalt"],
                "considerations": [r"Erw[äa]gung"],
                "rulings": [
                    r"Demnach (erkennt|beschliesst)",
                    r"Demnach wird (beschlossen|verfügt)",
                    r"Dispositiv",
                ],
                "footer": [r"Rechtsmittel"],
            },
        },
    },
    "ZH_Sozialversicherungsgericht": {
        "markers": {
            "de": {
                "facts": [r"Sachverhalt:"],
                "considerations": [r"in Erw[äa]gung", r"Erw[äa]gungen:"],
                "rulings": [
                    r"Das Gericht (erkennt|beschliesst|verfügt):",
                    r"(Der|Die) Einzelrichter(in)? (erkennt|beschliesst|verfügt):",
                    r"(beschliesst|erkennt) das Gericht:",
                    r"und erkennt sodann:",
                    r"(Der|Die) Referent(in)? (erkennt|beschliesst|verfügt):",
                ],
                "footer": [r"Gegen diesen Entscheid kann"],
            },
        },
    },
    "VD_Omni": {
        "markers": {
            "fr": {
                "facts": [r"[Vv]u les faits suivants\s?:?", r"constate en fait\s?:", r"En fait\s?:"],
                "considerations": [
                    r"[Cc]onsidérant en droit\s?:?", r"considère en droit\s?:",
                    r"^considérant$", r"Considérant", r"En droit\s?:",
                    r"constate ce qui suit en fait et en droit\s?:",
                ],
                "rulings": [r"du Tribunal cantonal arrête:", r"Par ces motifs"],
                "footer": [
                    r"L[ea] président[e]?\s?:( L[ea] greffi[eè]re?\s?:)?",
                    r"Au nom du Tribunal administratif\s?:",
                ],
            },
        },
    },
    "VD_FindInfo": {
        "markers": {
            "fr": {
                "facts": [r"En fait", r"E n f a i t", r"EN FAIT", r"Vu l'enquête"],
                "considerations": [r"E n d r o i t", r"En droit", r"En fait et en droit"],
                "rulings": [r"ces motifs,$"],
                "footer": [
                    r"l'envoi de photocopies\.", r"L[ea] greffi[eè]re?",
                    r"L['’]arrêt (qui précède|est exécutoire)",
                ],
            },
            "de": {
                "facts": [r"Sachverhalt"],
                "considerations": [r"Aus den Erw[äa]gungen"],
                "footer": [r"Rechtsmittelbelehrung"],
            },
        },
    },
}


def _compiled(lang: str, spider: str | None = None) -> dict[str, list[re.Pattern]]:
    override = SPIDER_OVERRIDES.get(spider or "", {}).get("markers", {})
    generic = SECTION_MARKERS.get(lang, SECTION_MARKERS["de"])
    markers = {**generic, **override.get(lang, {})}
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
    compiled = _compiled(lang or "de", spider)
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
