"""Court / chamber dimension ingest (reference
`scrc/preprocessors/create_court_and_chamber_tables.py:13-90` +
`legal_info/extend_court_chambers.py`).

The reference downloads `Facetten_alle.json` (nested
canton → gerichte → kammern with DYNAMIC keys: canton codes, court
strings and chamber strings are the object keys), merges in per-chamber
law areas from the extended file, then walks it with nested Python
loops issuing one INSERT per missing court/chamber.

Spark-first the dynamic-key nesting is a ``MapType`` all the way down:
``from_json`` with ``map<string, struct<...>>`` at each level, then two
``explode`` steps — the whole flatten is one narrow projection chain
(no UDF, no driver loop), and works identically whether the input is
one national file or millions of per-tenant registry files.

The incremental "add only missing" insert becomes an anti-join append
with ids continued past the existing maximum — one broadcast of the
(tiny) existing dim, no per-row SELECTs (the J8 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# canton -> {de,fr,it, gerichte: court -> {de,fr,it, kammern:
#   chamber -> {spider, de, fr, it, Rechtsgebiete}}}
# (`court_chambers.json` shape; Rechtsgebiete only present after the
# ExtendCourtChambers merge — absent parses to null)
COURT_CHAMBERS_DDL = (
    "map<string, struct<"
    "de:string, fr:string, it:string, "
    "gerichte:map<string, struct<"
    "de:string, fr:string, it:string, "
    "kammern:map<string, struct<"
    "spider:string, de:string, fr:string, it:string, "
    "Rechtsgebiete:array<string>"
    ">>>>>>"
)


def flatten_court_chambers(df: DataFrame, json_col: str) -> DataFrame:
    """Raw JSON strings → one row per chamber with the full dimension
    path: canton, court_string, chamber_string, spider, per-language
    court/chamber names, law areas.  Courts and cantons project out of
    this with ``select(...).distinct()`` — one parse, all three dims."""
    parsed = df.select(
        F.from_json(F.col(json_col), COURT_CHAMBERS_DDL).alias("m")
    )
    cantons = parsed.select(F.explode("m").alias("canton", "c"))
    courts = cantons.select(
        "canton",
        F.explode(F.col("c.gerichte")).alias("court_string", "g"),
    )
    return courts.select(
        "canton",
        "court_string",
        F.col("g.de").alias("court_name_de"),
        F.col("g.fr").alias("court_name_fr"),
        F.col("g.it").alias("court_name_it"),
        F.explode(F.col("g.kammern")).alias("chamber_string", "k"),
    ).select(
        "canton",
        "court_string",
        "court_name_de",
        "court_name_fr",
        "court_name_it",
        "chamber_string",
        F.col("k.spider").alias("spider"),
        F.col("k.de").alias("chamber_name_de"),
        F.col("k.fr").alias("chamber_name_fr"),
        F.col("k.it").alias("chamber_name_it"),
        F.col("k.Rechtsgebiete").alias("law_areas"),
    )


def extend_with_law_areas(
    chambers: DataFrame, extended: DataFrame
) -> DataFrame:
    """`extend_court_chambers.py:12-27`: carry each chamber's
    Rechtsgebiete over from the previously-extended file; chambers new
    to the base file get the [''] placeholder.  The nested three-level
    dict walk is a single left join on the chamber key."""
    ext = extended.select(
        "chamber_string", F.col("law_areas").alias("_ext_law_areas")
    )
    return (
        chambers.drop("law_areas")
        .join(F.broadcast(ext), on="chamber_string", how="left")
        .withColumn(
            "law_areas", F.coalesce(F.col("_ext_law_areas"), F.array(F.lit("")))
        )
        .drop("_ext_law_areas")
    )


def append_missing_dim_rows(
    existing: DataFrame, incoming: DataFrame, key: str, id_col: str
) -> DataFrame:
    """The creator's "insert courts/chambers not present yet"
    (`create_court_and_chamber_tables.py:60-90`) without per-row
    SELECT/INSERT: anti-join the incoming rows against the existing dim
    on ``key``, number the genuinely-new ones past the current max id,
    and union.  Deterministic (ordered by key) so reruns assign the
    same ids."""
    new_rows = incoming.join(existing.select(key), on=key, how="left_anti")
    max_id = existing.agg(
        F.coalesce(F.max(id_col), F.lit(0)).alias("_max_id")
    )
    numbered = (
        new_rows.crossJoin(F.broadcast(max_id))
        .withColumn(
            id_col,
            F.col("_max_id")
            + F.row_number().over(Window.orderBy(key)).cast("long"),
        )
        .drop("_max_id")
    )
    return existing.unionByName(
        numbered.select(*existing.columns), allowMissingColumns=False
    )
