"""E10 NameToGender — gender enrichment for extracted persons.

Reference behavior (`scrc/preprocessors/name_to_gender.py:18-160`):
person rows with unknown gender (natural persons only, anonymized
``%._`` names excluded) are looked up against the genderize.io API in
10-name chunks with a local JSON cache, then written back.

The 100 TB design keeps the external API OFF the executors (SURVEY.md
§2.11 "external-service UDF"): distinct unknown names collect to the
driver (a tiny set relative to the corpus), the lookup runs there
against a pluggable resolver (the real HTTP client in production; a
deterministic local table here — no network in this container), and
the result broadcasts back as one dim join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic offline stand-in for the genderize.io responses
_LOCAL_GENDER_TABLE = {
    "Huber": "m", "Keller": "m", "Weber": "m", "Rossi": "m",
    "Meier": "f", "Schmid": "f", "Favre": "f", "Bernasconi": "f",
}


def local_gender_resolver(names: list[str]) -> dict[str, str | None]:
    return {n: _LOCAL_GENDER_TABLE.get(n.split()[0]) for n in names}


# upper bound on names collected to the driver: distinct personal names
# are tiny relative to any corpus (Swiss courts cite thousands of
# names, not millions), but a pathological corpus (e.g. OCR noise in
# the name column) must not be able to OOM the driver
MAX_DRIVER_NAMES = 100_000


def enrich_gender(
    persons: DataFrame,
    name_col: str = "name",
    gender_col: str = "gender",
    resolver: Callable[[list[str]], dict[str, str | None]] = local_gender_resolver,
    max_names: int = MAX_DRIVER_NAMES,
) -> DataFrame:
    """Fill null genders via driver-side lookup + broadcast join.

    Mirrors the reference's WHERE clause (`name_to_gender.py`): only
    rows with NULL gender, and never anonymized ``X._`` placeholders.
    The driver-side collect is bounded by ``max_names``; overflow names
    keep their null gender and a warning records the truncation.
    """
    import logging

    spark = persons.sparkSession
    unknown = (
        persons.where(F.col(gender_col).isNull())
        .where(~F.col(name_col).rlike(r"\._$"))
        .select(name_col)
        .distinct()
        .limit(max_names + 1)
    )
    names = [r[0] for r in unknown.collect()]  # tiny: distinct names only
    if len(names) > max_names:
        logging.getLogger(__name__).warning(
            "enrich_gender: more than %d distinct unresolved names; "
            "resolving the first %d, remainder keeps null gender",
            max_names, max_names,
        )
        names = names[:max_names]
    resolved = resolver(names)
    if not resolved:
        return persons
    mapping = spark.createDataFrame(
        [(n, g) for n, g in resolved.items() if g is not None],
        [name_col, "__resolved_gender"],
    )
    out = persons.join(F.broadcast(mapping), on=name_col, how="left")
    return out.withColumn(
        gender_col, F.coalesce(F.col(gender_col), F.col("__resolved_gender"))
    ).drop("__resolved_gender")
