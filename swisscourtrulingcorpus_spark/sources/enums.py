"""Enum dimension tables with the reference's EXACT integer ids
(`scrc/enums/*.py` + `database_creation/setup_values_creation.py:
12-17`), exposed as tiny broadcast-able DataFrames.

The engine carries enums as strings everywhere (Catalyst folds the
literal maps in `functions/domain.py`), but a user migrating FROM the
reference's Postgres schema holds foreign keys — these dims give the
id↔string bridge with the reference's exact numbering, so an id-keyed
export from the old system joins losslessly.

Note two reference quirks preserved deliberately:
- Judgment ids are NOT alphabetical or declaration-ordered
  (`judgment.py`: approval=1, dismissal=2, inadmissible=3,
  partial_approval=4, partial_dismissal=5, unification=6, write_off=7).
- Language ids cover only de/fr/it/en (`language.py:get_id_value`);
  anything else is the reference's -1 unknown state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LANGUAGE_IDS: dict[str, int] = {"de": 1, "fr": 2, "it": 3, "en": 4}

SECTION_IDS: dict[str, int] = {
    "full_text": 1,
    "header": 2,
    "topic": 3,
    "facts": 4,
    "considerations": 5,
    "rulings": 6,
    "footer": 7,
}

JUDGMENT_IDS: dict[str, int] = {
    "approval": 1,
    "dismissal": 2,
    "inadmissible": 3,
    "partial_approval": 4,
    "partial_dismissal": 5,
    "unification": 6,
    "write_off": 7,
}

CITATION_TYPE_IDS: dict[str, int] = {"ruling": 1, "law": 2, "commentary": 3}

JUDICIAL_PERSON_TYPES: list[str] = [
    "federal_judge",
    "deputy_federal_judge",
    "clerk",
]

PARTY_TYPES: list[str] = [
    "plaintiff",
    "defendant",
    "representation_plaintiff",
    "representation_defendant",
]


def _dim(
    spark: SparkSession, ids: dict[str, int], id_col: str, name_col: str
) -> DataFrame:
    rows = [(v, k) for k, v in sorted(ids.items(), key=lambda kv: kv[1])]
    return spark.createDataFrame(rows, f"{id_col} int, {name_col} string")


def language_dim(spark: SparkSession) -> DataFrame:
    return _dim(spark, LANGUAGE_IDS, "language_id", "iso_code")


def section_type_dim(spark: SparkSession) -> DataFrame:
    return _dim(spark, SECTION_IDS, "section_type_id", "name")


def judgment_dim(spark: SparkSession) -> DataFrame:
    return _dim(spark, JUDGMENT_IDS, "judgment_id", "text")


def citation_type_dim(spark: SparkSession) -> DataFrame:
    return _dim(spark, CITATION_TYPE_IDS, "citation_type_id", "name")
