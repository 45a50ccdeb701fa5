"""Court-person registry enrichment (reference
`court_composition_extracting_functions.py:592-625`
``match_person_to_database``): extracted judge/clerk names match a
registry of known court personnel (`legal_info/personal_information.
json` shape: name, role, gender, political party), taking the
registry's canonical name, gender and party on a UNIQUE match.

Matching semantics, faithfully:
- dots stripped, name split on whitespace;
- single-letter tokens are treated as initials — they must PREFIX-match
  some word of the registry name (``re.search(rf'\\s{initial}\\w*')``);
- the remaining full tokens must be a SUBSET of the registry name's
  tokens;
- exactly one matching registry person → enriched; zero or several →
  left unenriched (ambiguity is not guessed away).

Spark-first decomposition (the reference nests four Python loops over
the whole registry per extracted person):
- the registry is dimension-sized (hundreds of people) → broadcast;
- subset matching becomes: explode the extracted FULL tokens, join
  token→(registry token, role) on the broadcast exploded registry,
  count distinct matched tokens per (person, candidate) and require
  the count to equal the person's token count;
- the initials check runs on the surviving candidate pairs with an
  ``exists`` over the registry token array (prefix comparison);
- uniqueness = a candidate-count aggregate, then one left join back.

The extracted side shuffles once on its own id (group for the
subset count); the registry never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _name_tokens(col: F.Column) -> F.Column:
    """Dot-stripped whitespace tokens, empties removed."""
    return F.filter(
        F.split(F.trim(F.regexp_replace(col, r"\.", "")), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def enrich_from_registry(
    extracted: DataFrame,
    registry: DataFrame,
    name_col: str = "name",
    role_col: str = "role",
    id_col: str = "person_id",
) -> DataFrame:
    """Add ``matched_name`` / ``gender`` / ``party`` / ``matched``
    columns to ``extracted`` (one row per extracted person with an
    ``id_col``, a ``name_col`` and a ``role_col``).

    ``registry`` columns: ``name``, ``role``, ``gender``, ``party``.
    """
    reg = registry.select(
        F.monotonically_increasing_id().alias("__rid"),
        F.col("name").alias("__reg_name"),
        F.col("role").alias("__reg_role"),
        "gender",
        "party",
        _name_tokens(F.col("name")).alias("__reg_tokens"),
    )
    reg_tokens = reg.select(
        "__rid", "__reg_role", F.explode("__reg_tokens").alias("__tok")
    )

    toks = _name_tokens(F.col(name_col))
    ext = extracted.select(
        F.col(id_col).alias("__eid"),
        F.col(role_col).alias("__role"),
        F.filter(toks, lambda t: F.length(t) > 1).alias("__full"),
        F.filter(toks, lambda t: F.length(t) == 1).alias("__initials"),
    )
    ext_tokens = ext.select(
        "__eid", "__role", F.size("__full").alias("__n"), F.explode("__full").alias("__tok")
    )

    # subset check: all full tokens of the extracted name appear in the
    # candidate's token set (count of distinct joined tokens == n)
    candidates = (
        ext_tokens.join(
            F.broadcast(reg_tokens),
            (ext_tokens.__tok == reg_tokens.__tok)
            & (ext_tokens.__role == reg_tokens.__reg_role),
        )
        .groupBy("__eid", "__n", "__rid")
        .agg(F.countDistinct(ext_tokens.__tok).alias("__hit"))
        .where(F.col("__hit") == F.col("__n"))
        .select("__eid", "__rid")
    )

    # initials: every single-letter token must prefix-match some
    # registry token (case-exact on the uppercased initial, as the
    # reference's \s{initial.upper()}\w* search)
    paired = (
        candidates.join(ext.select("__eid", "__initials"), on="__eid")
        .join(F.broadcast(reg), on="__rid")
        .where(
            F.forall(
                "__initials",
                lambda i: F.exists(
                    "__reg_tokens", lambda t: t.startswith(F.upper(i))
                ),
            )
        )
    )

    # exactly-one-candidate rule
    unique = (
        paired.groupBy("__eid")
        .agg(
            F.count(F.lit(1)).alias("__n_cand"),
            F.first("__reg_name").alias("matched_name"),
            F.first("gender").alias("gender"),
            F.first("party").alias("party"),
        )
        .where(F.col("__n_cand") == 1)
        .drop("__n_cand")
    )
    return (
        extracted.join(
            unique, extracted[id_col] == unique.__eid, "left"
        )
        .withColumn("matched", F.col("__eid").isNotNull())
        .drop("__eid")
    )
