"""TERMDAT term-definitions ingest (reference
`scrc/utils/term_definitions_converter.py:11-65`: the Swiss federal
terminology database arrives as one XML file of ``<Eintrag>`` entries;
the converter keeps only validated entries with reliability >= 3 and
flattens per-language synonym definitions into a condensed JSON).

The reference parses the whole file driver-side with xmltodict and
writes one JSON blob.  Spark-first, the corpus lands as a DataFrame of
XML strings (one ``<xml>`` document per row — a single national export
splits into per-collection shards at ingest) and the parse runs as an
Arrow-batched ``mapInPandas`` flatMap: one entry × language ×
definition per output ROW, so the result is a proper relational table
the broadcast-dim joins (J9, law_abbr→sr_number style) consume
directly instead of a nested JSON blob.

Filter semantics mirrored exactly (`term_definitions_converter.py:
40-44`): ``BearbeitungsStatus != 'Validiert'`` entries are dropped, as
are entries with ``ZuverlaessigkeitsCode < 3``.  The xmltodict
one-synonym-is-a-dict quirk the reference guards against
(`term_definitions_converter.py:54-55`) does not arise with
ElementTree child iteration, but the semantics — every synonym's every
definition, in document order — are the same.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TERMDAT_SCHEMA = StructType(
    [
        StructField("term_id", LongType()),
        StructField("collection", StringType()),
        StructField("areas", StringType()),
        StructField("reliability", IntegerType()),
        StructField("lang", StringType()),
        StructField("def_type", StringType()),
        StructField("def_text", StringType()),
    ]
)

LANGUAGES = ["de", "fr", "it", "rm", "en", "es"]  # :17


def parse_termdat_string(xml: str) -> list[dict]:
    """One ``<xml>`` export shard → validated definition rows.
    Malformed XML yields no rows (quarantine-by-empty; the source file
    column of the enclosing DataFrame still records the shard)."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    entries = root.find("Eintraege")
    if entries is None:
        return []
    rows: list[dict] = []
    for entry in entries.iter("Eintrag"):
        kopf = entry.find("Kopf")
        if kopf is None:
            continue
        if (kopf.findtext("BearbeitungsStatus") or "") != "Validiert":
            continue  # skip not validated status (:40-41)
        try:
            reliability = int(kopf.findtext("ZuverlaessigkeitsCode") or "")
        except ValueError:
            continue
        if reliability < 3:
            continue  # skip bad reliability ones (:42-44)
        base = {
            "term_id": int(entry.get("Id", "0")),
            "collection": kopf.findtext("Sammlung"),
            "areas": kopf.findtext("Sachgebiete"),
            "reliability": reliability,
        }
        zones = entry.find("Sprachzonen")
        if zones is None:
            continue
        for zone in zones.iter("Sprachzone"):
            lang = (zone.get("Sprache") or "").lower()
            if lang not in LANGUAGES:
                continue
            for synonym in zone.iter("Synonym"):
                for definition in synonym.iter("Definition"):
                    rows.append(
                        {
                            **base,
                            "lang": lang,
                            "def_type": definition.findtext("Typ"),
                            "def_text": definition.findtext("Text"),
                        }
                    )
    return rows


def term_definitions_df(df: DataFrame, xml_col: str) -> DataFrame:
    """Distributed TERMDAT parse: XML-shard DataFrame → one row per
    (entry, language, definition).  The wide XML column dies at the
    map; downstream shuffles move only the narrow structured rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TERMDAT_SCHEMA.fields]
        for pdf in it:
            out: list[dict] = []
            for x in pdf[xml_col]:
                out.extend(parse_termdat_string(x))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(batches, TERMDAT_SCHEMA)


def law_abbreviations_df(term_defs: DataFrame) -> DataFrame:
    """The LawUtilSingleton abbreviation map
    (`scrc/utils/law_util_singleton.py:25-45` build_law_abbr_by_lang):
    definition entries of type 'ab' keyed (language, abbreviation) →
    the law's TERMDAT id — the id is language-independent, which is how
    the reference identifies 'OR'/'CO' (de/fr/it names of the same
    code) as one law.

    A tiny dim: broadcast it into citation resolution
    (`law_citation.py:60-74` abbreviation → sr_number lookup) instead
    of the reference's per-row dict access.
    """
    return (
        term_defs.where(F.col("def_type") == "ab")
        .select(
            "lang",
            F.col("def_text").alias("abbreviation"),
            F.col("term_id").alias("law_id"),
        )
        .dropDuplicates(["lang", "abbreviation"])
    )
