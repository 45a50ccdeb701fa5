"""Unit tests for the court/chamber dimension ingest
(`swisscourtrulingcorpus_spark/sources/court_chambers.py`), mirroring
`create_court_and_chamber_tables.py` + `extend_court_chambers.py`."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.sources.court_chambers import (
    append_missing_dim_rows,
    extend_with_law_areas,
    flatten_court_chambers,
)

_SAMPLE = {
    "ZH": {
        "de": "Zürich",
        "fr": "Zurich",
        "it": "Zurigo",
        "gerichte": {
            "ZH_VG": {
                "de": "Verwaltungsgericht",
                "fr": "Tribunal administratif",
                "it": "Tribunale amministrativo",
                "kammern": {
                    "ZH_VG_001": {
                        "spider": "ZH_Verwaltungsgericht",
                        "de": "1. Abteilung",
                        "fr": "1re section",
                        "it": "1a sezione",
                    },
                    "ZH_VG_002": {
                        "spider": "ZH_Verwaltungsgericht",
                        "de": "2. Abteilung",
                        "fr": "2e section",
                        "it": "2a sezione",
                    },
                },
            }
        },
    },
    "CH": {
        "de": "Schweiz",
        "fr": "Suisse",
        "it": "Svizzera",
        "gerichte": {
            "CH_BGer": {
                "de": "Bundesgericht",
                "fr": "Tribunal fédéral",
                "it": "Tribunale federale",
                "kammern": {
                    "CH_BGer_001": {
                        "spider": "CH_BGer",
                        "de": "I. öffentlich-rechtliche Abteilung",
                        "fr": "Ire Cour de droit public",
                        "it": "I Corte di diritto pubblico",
                    }
                },
            }
        },
    },
}


def test_flatten_court_chambers(spark):
    df = spark.createDataFrame([(json.dumps(_SAMPLE),)], ["j"])
    rows = {r["chamber_string"]: r for r in flatten_court_chambers(df, "j").collect()}
    assert set(rows) == {"ZH_VG_001", "ZH_VG_002", "CH_BGer_001"}
    r = rows["ZH_VG_001"]
    assert r["canton"] == "ZH"
    assert r["court_string"] == "ZH_VG"
    assert r["court_name_de"] == "Verwaltungsgericht"
    assert r["spider"] == "ZH_Verwaltungsgericht"
    assert r["chamber_name_fr"] == "1re section"
    assert r["law_areas"] is None  # base file carries no Rechtsgebiete
    # three dims out of one parse
    courts = (
        flatten_court_chambers(df, "j")
        .select("canton", "court_string")
        .distinct()
        .count()
    )
    assert courts == 2


def test_extend_with_law_areas(spark):
    df = spark.createDataFrame([(json.dumps(_SAMPLE),)], ["j"])
    chambers = flatten_court_chambers(df, "j")
    extended = spark.createDataFrame(
        [("ZH_VG_001", ["civil_law", "public_law"])],
        ["chamber_string", "law_areas"],
    )
    out = {
        r["chamber_string"]: r["law_areas"]
        for r in extend_with_law_areas(chambers, extended).collect()
    }
    assert out["ZH_VG_001"] == ["civil_law", "public_law"]
    assert out["ZH_VG_002"] == [""]  # new chamber -> placeholder (:18-20)
    assert out["CH_BGer_001"] == [""]


def test_append_missing_dim_rows(spark):
    existing = spark.createDataFrame(
        [(1, "CH_BGer"), (2, "ZH_VG")], ["court_id", "court_string"]
    )
    incoming = spark.createDataFrame(
        [("ZH_VG",), ("ZH_OG",), ("BE_VG",)], ["court_string"]
    ).withColumn("court_id", F.lit(None).cast("long"))
    out = append_missing_dim_rows(existing, incoming, "court_string", "court_id")
    rows = {r["court_string"]: r["court_id"] for r in out.collect()}
    # existing rows keep their ids; new rows numbered past the max,
    # ordered by key (BE_VG < ZH_OG)
    assert rows == {"CH_BGer": 1, "ZH_VG": 2, "BE_VG": 3, "ZH_OG": 4}
    # rerun is a no-op
    again = append_missing_dim_rows(out, incoming, "court_string", "court_id")
    assert again.count() == 4


def test_enum_dims_reference_ids(spark):
    from swisscourtrulingcorpus_spark.sources.enums import (
        JUDGMENT_IDS,
        citation_type_dim,
        judgment_dim,
        language_dim,
        section_type_dim,
    )

    langs = {r["iso_code"]: r["language_id"] for r in language_dim(spark).collect()}
    assert langs == {"de": 1, "fr": 2, "it": 3, "en": 4}
    secs = {r["name"]: r["section_type_id"] for r in section_type_dim(spark).collect()}
    assert secs["full_text"] == 1 and secs["footer"] == 7
    # the reference's non-sequential judgment numbering is preserved
    assert JUDGMENT_IDS["partial_approval"] == 4
    assert JUDGMENT_IDS["dismissal"] == 2
    j = {r["text"]: r["judgment_id"] for r in judgment_dim(spark).collect()}
    assert j == JUDGMENT_IDS
    c = {r["name"]: r["citation_type_id"] for r in citation_type_dim(spark).collect()}
    assert c == {"ruling": 1, "law": 2, "commentary": 3}
