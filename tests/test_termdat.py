"""Unit tests for the TERMDAT term-definitions parser
(`swisscourtrulingcorpus_spark/sources/termdat.py`), pinning the
reference's filter semantics (`term_definitions_converter.py:40-44`)
and the per-language definition flatten."""

from __future__ import annotations

from swisscourtrulingcorpus_spark.sources.termdat import (
    parse_termdat_string,
    term_definitions_df,
)

_ENTRY = """
<Eintrag Id="{id}">
  <Kopf>
    <BearbeitungsStatus>{status}</BearbeitungsStatus>
    <ZuverlaessigkeitsCode>{rel}</ZuverlaessigkeitsCode>
    <Sammlung>SR-1</Sammlung>
    <Sachgebiete>Recht</Sachgebiete>
  </Kopf>
  <Sprachzonen>{zones}</Sprachzonen>
</Eintrag>
"""

_ZONE_DE = """
<Sprachzone Sprache="DE">
  <Synonym>
    <Definition><Typ>Haupteintrag</Typ><Text>Vertrag</Text></Definition>
    <Definition><Typ>Kurzform</Typ><Text>Vtg</Text></Definition>
  </Synonym>
  <Synonym>
    <Definition><Typ>Synonym</Typ><Text>Kontrakt</Text></Definition>
  </Synonym>
</Sprachzone>
"""


def _wrap(entries: str) -> str:
    return f"<xml><Eintraege>{entries}</Eintraege></xml>"


def test_flattens_all_synonym_definitions():
    xml = _wrap(_ENTRY.format(id=7, status="Validiert", rel=4, zones=_ZONE_DE))
    rows = parse_termdat_string(xml)
    assert [r["def_text"] for r in rows] == ["Vertrag", "Vtg", "Kontrakt"]
    assert all(r["term_id"] == 7 and r["lang"] == "de" for r in rows)
    assert rows[0]["collection"] == "SR-1"
    assert rows[0]["reliability"] == 4


def test_status_and_reliability_filters():
    not_validated = _ENTRY.format(
        id=1, status="Entwurf", rel=5, zones=_ZONE_DE
    )
    low_reliability = _ENTRY.format(
        id=2, status="Validiert", rel=2, zones=_ZONE_DE
    )
    kept = _ENTRY.format(id=3, status="Validiert", rel=3, zones=_ZONE_DE)
    rows = parse_termdat_string(_wrap(not_validated + low_reliability + kept))
    assert {r["term_id"] for r in rows} == {3}


def test_unknown_language_skipped_and_malformed_empty():
    zone = '<Sprachzone Sprache="XX"><Synonym><Definition>' \
           "<Typ>t</Typ><Text>x</Text></Definition></Synonym></Sprachzone>"
    rows = parse_termdat_string(
        _wrap(_ENTRY.format(id=4, status="Validiert", rel=5, zones=zone))
    )
    assert rows == []
    assert parse_termdat_string("<xml><broken") == []


def test_distributed_parse(spark):
    xml = _wrap(_ENTRY.format(id=9, status="Validiert", rel=3, zones=_ZONE_DE))
    df = spark.createDataFrame([(xml,), ("<xml><broken",)], ["x"])
    out = term_definitions_df(df, "x").collect()
    assert len(out) == 3
    assert {r["term_id"] for r in out} == {9}


def test_law_abbreviations_dim(spark):
    from swisscourtrulingcorpus_spark.sources.termdat import (
        law_abbreviations_df,
        term_definitions_df,
    )

    zone_tpl = (
        '<Sprachzone Sprache="{lang}"><Synonym>'
        "<Definition><Typ>ab</Typ><Text>{ab}</Text></Definition>"
        "<Definition><Typ>vollform</Typ><Text>{full}</Text></Definition>"
        "</Synonym></Sprachzone>"
    )
    zones = zone_tpl.format(lang="DE", ab="OR", full="Obligationenrecht") + \
        zone_tpl.format(lang="FR", ab="CO", full="Code des obligations")
    xml = _wrap(_ENTRY.format(id=220, status="Validiert", rel=5, zones=zones))
    df = spark.createDataFrame([(xml,)], ["x"])
    abbrs = {
        (r["lang"], r["abbreviation"]): r["law_id"]
        for r in law_abbreviations_df(term_definitions_df(df, "x")).collect()
    }
    # one language-independent id for both names of the same law; the
    # non-abbreviation definitions don't leak in
    assert abbrs == {("de", "OR"): 220, ("fr", "CO"): 220}
