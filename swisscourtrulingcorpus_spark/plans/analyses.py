"""Analyses over the extracted corpus (reference `scrc/analyses/`).

Fundamental-importance analysis (`analyses/fundamental_importance.py:
30-263`): find decisions discussing a "legal question of fundamental
importance", split the matching text into sentences, flag sentences
whose tokens carry a negation word, and summarize negated /
not-negated counts per year, legal area and language.

Spark-first shape: the whole chain is column expressions — sentence
split (lookbehind regex), phrase membership (``exists`` over a literal
phrase array), token-level negation check (``arrays_overlap`` against
a broadcast-literal negation vocabulary) — no UDF, no collect; the
reference's nltk sentence/word tokenizers collapse to regex splits
(its own comment concedes sentence splitting in legal text is
approximate either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language -> phrases announcing a fundamental-importance question
# (condensed from `fundamental_importance.py:37-42`)
FUNDAMENTAL_PHRASES: dict[str, list[str]] = {
    "de": [
        "Rechtsfrage von grundsätzlicher Bedeutung",
        "Frage von grundsätzlicher Bedeutung",
    ],
    "fr": ["question juridique de principe"],
    "it": [
        "questione di diritto di importanza fondamentale",
        "questione giuridica d'importanza fondamentale",
    ],
}

# language -> negation vocabulary (condensed from the reference's
# `legal_info/negations.json` word lists)
NEGATION_WORDS: dict[str, list[str]] = {
    "de": [
        "kein", "keine", "keiner", "nicht", "nichts", "nie", "niemals",
        "keinesfalls", "keineswegs", "mangels", "weder", "verneint",
    ],
    "fr": ["pas", "plus", "jamais", "aucun", "aucune", "ni", "sans", "nie"],
    "it": ["non", "nessun", "nessuna", "mai", "senza", "né", "nega"],
}

_SENTENCE_SPLIT = r"(?<=[.!?])\s+"
_WORD_SPLIT = r"[^\wäöüéèàçì']+"


def fundamental_importance_sentences(
    tables: dict[str, DataFrame], section: str = "considerations"
) -> DataFrame:
    """One row per sentence that mentions a fundamental-importance
    phrase, with its negation flag — the reference's
    sentencize → filter → contains_negation chain (`:223-232,202-210`)."""
    sec = tables["section"].where(F.col("section") == section).select(
        "decision_id", "language", F.col("section_text").alias("text")
    )
    phrases = F.element_at(
        F.create_map(
            *[
                x
                for lang, ps in FUNDAMENTAL_PHRASES.items()
                for x in (F.lit(lang), F.array(*[F.lit(p) for p in ps]))
            ]
        ),
        F.col("language"),
    )
    negations = F.element_at(
        F.create_map(
            *[
                x
                for lang, ws in NEGATION_WORDS.items()
                for x in (F.lit(lang), F.array(*[F.lit(w) for w in ws]))
            ]
        ),
        F.col("language"),
    )
    sentences = sec.select(
        "decision_id",
        "language",
        phrases.alias("phrases"),
        negations.alias("negations"),
        F.explode(F.split("text", _SENTENCE_SPLIT)).alias("sentence"),
    ).where(
        F.exists("phrases", lambda p: F.col("sentence").contains(p))
    )
    tokens = F.filter(
        F.split(F.lower("sentence"), _WORD_SPLIT), lambda t: t != ""
    )
    return sentences.select(
        "decision_id",
        "language",
        "sentence",
        F.arrays_overlap(tokens, "negations").alias("negated"),
    )


def fundamental_importance_summary(
    tables: dict[str, DataFrame],
    group_by: str = "year",
    section: str = "considerations",
) -> DataFrame:
    """The per-group summary table (`create_summary_df`, `:180-199`):
    negated / not-negated / total decision counts and the not-negated
    percentage, grouped by year, legal area or language.  A decision
    counts as negated when ANY of its matching sentences is (the
    reference's row-level flag aggregated the same way)."""
    from swisscourtrulingcorpus_spark.plans.datasets_extra import (
        _CHAMBER_LAW_AREA,
    )

    sent = fundamental_importance_sentences(tables, section=section)
    per_decision = sent.groupBy("decision_id", "language").agg(
        F.max(F.col("negated").cast("int")).cast("boolean").alias("negated")
    )
    meta = tables["decision"].select(
        "decision_id",
        F.year("date").alias("year"),
        F.col("chamber"),
    )
    law_area = F.element_at(
        F.create_map(
            *[
                x
                for k, v in _CHAMBER_LAW_AREA.items()
                for x in (F.lit(k), F.lit(v))
            ]
        ),
        F.col("chamber"),
    )
    joined = per_decision.join(meta, on="decision_id").withColumn(
        "legal_area", law_area
    )
    return (
        joined.groupBy(group_by)
        .agg(
            F.sum(F.col("negated").cast("long")).alias("negated"),
            F.sum((~F.col("negated")).cast("long")).alias("not_negated"),
            F.count(F.lit(1)).alias("total"),
        )
        .withColumn(
            "not_negated_percentage",
            F.round(F.lit(100.0) * F.col("not_negated") / F.col("total"), 2),
        )
    )
