"""Gate queries for the annotation-campaign operators (reference
`scrc/annotation/` subtree).

Same construction-arithmetic oracle pattern as `extraction_queries.py`:
the synthetic ``documents`` table provides only ``doc_id``; every input
(annotator token selections, model confidences, facts lengths, headers)
is derived from ``doc_id`` arithmetic on the Spark side, and the DuckDB
oracle reconstructs the expected OUTPUT independently — closed-form for
the interval-set IAA scores, window SQL for the stratified pick, plain
arithmetic for the occlusion deltas.  What the gate therefore proves is
the operator semantics (join/window/array plumbing), not the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.annotation import (
    explainability_scores,
    iaa_pairwise_agreement,
    occlude_spans,
    span_tokens,
    stratified_annotation_pick,
)
from swisscourtrulingcorpus_spark.plans.registry import QuerySpec
from swisscourtrulingcorpus_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# prodigy_annotation_set — the prodigy dataset-creation selection
# (`prodigy_dataset_creator.py:80-96` filter_dataset + `:233-236`
# shortest-facts-first stream + `:200-208` header_preprocessing)
# ---------------------------------------------------------------------------

# umlaut-free German month names so the extraction regex stays inside
# RE2's ASCII \w on the oracle side
_MONTHS = [
    "Januar", "Februar", "April", "Mai", "Juni", "Juli", "August",
    "September", "Oktober", "November", "Dezember",
]
_AREAS = ["penal_law", "social_law", "civil_law"]  # LEGAL_AREAS, :38
_HEADER_RX = r"[uU]rteil vom \d{1,2}\. [A-Za-z]+ \d{4}"


def q_prodigy_annotation_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One case per (year, legal_area, judgment) stratum, shortest facts
    first — 6 years x 3 areas x 2 outcomes = 36 rows (mode 'je',
    `prodigy_dataset_creator.py:125-127`), with the reference's
    header_preprocessing regex span."""
    d = F.col("doc_id")
    # strata digits must be INDEPENDENT (mixed-radix, not three
    # correlated modulos of the same id) so all 6x3x2 = 36 strata are
    # populated
    area_idx = F.expr("doc_id div 6") % 3
    judgment_idx = F.expr("doc_id div 18") % 2
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(2015) + d % 6).alias("year"),
        F.element_at(
            F.array(*[F.lit(a) for a in _AREAS]), (area_idx + 1).cast("int")
        ).alias("legal_area"),
        F.when(judgment_idx == 0, F.lit("approval"))
        .otherwise(F.lit("dismissal"))
        .alias("judgment"),
        (F.lit(100) + (d * 37) % 900).alias("facts_len"),
        F.concat(
            F.lit("Besetzung Bundesrichter Muster, Gerichtsschreiber Weber. "
                  "Urteil vom "),
            (F.lit(1) + d % 28).cast("string"),
            F.lit(". "),
            F.element_at(
                F.array(*[F.lit(m) for m in _MONTHS]), (d % 11 + 1).cast("int")
            ),
            F.lit(" "),
            (F.lit(2015) + d % 6).cast("string"),
            F.lit(" i.S. Partei A gegen Partei B."),
        ).alias("header"),
    )
    picked = stratified_annotation_pick(
        base,
        strata=["year", "legal_area", "judgment"],
        order_by=[F.col("facts_len"), F.col("doc_id")],
    )
    return picked.select(
        "year",
        "legal_area",
        "judgment",
        "doc_id",
        "facts_len",
        F.regexp_extract("header", _HEADER_RX, 0).alias("header_span"),
    )


PRODIGY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         2015 + doc_id % 6 AS year,
         ['penal_law', 'social_law', 'civil_law'][CAST((doc_id // 6) % 3 AS INTEGER) + 1] AS legal_area,
         CASE WHEN (doc_id // 18) % 2 = 0 THEN 'approval' ELSE 'dismissal' END AS judgment,
         100 + (doc_id * 37) % 900 AS facts_len,
         'Urteil vom ' || CAST(1 + doc_id % 28 AS VARCHAR) || '. '
           || ['Januar','Februar','April','Mai','Juni','Juli','August',
               'September','Oktober','November','Dezember'][CAST(doc_id % 11 AS INTEGER) + 1]
           || ' ' || CAST(2015 + doc_id % 6 AS VARCHAR) AS header_span
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY year, legal_area, judgment
           ORDER BY facts_len, doc_id) AS rn
  FROM base
)
SELECT year, legal_area, judgment, doc_id, facts_len, header_span
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# iaa_token_agreement — pairwise IAA over token selections
# (`judgment_explainability/analysis/utils/scores.py`); annotator
# selections are integer INTERVALS so the oracle has a closed form
# ---------------------------------------------------------------------------

def q_iaa_token_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.sequence(F.lit(0), (d % 5) + 4).alias("tokens_angela"),
        F.sequence(d % 3, (d % 3) + 5).alias("tokens_lynn"),
        F.sequence(F.lit(2), (d % 7) + 2).alias("tokens_thomas"),
    )
    return iaa_pairwise_agreement(
        docs,
        token_cols={
            "angela": "tokens_angela",
            "lynn": "tokens_lynn",
            "thomas": "tokens_thomas",
        },
        id_cols=["doc_id"],
    )


# |[s1,e1] ∩ [s2,e2]| = max(0, min(e1,e2) - max(s1,s2) + 1); all three
# selections are intervals, so every score is integer arithmetic and the
# divisions are the same small-int/small-int IEEE doubles in both engines
IAA_ORACLE = """
WITH iv AS (
  SELECT doc_id,
         0 AS s_a, doc_id % 5 + 4 AS e_a,
         doc_id % 3 AS s_l, doc_id % 3 + 5 AS e_l,
         2 AS s_t, doc_id % 7 + 2 AS e_t
  FROM documents
), pairs AS (
  SELECT doc_id,
         GREATEST(0, LEAST(e_a, e_l) - GREATEST(s_a, s_l) + 1) AS i_al,
         GREATEST(0, LEAST(e_a, e_t) - GREATEST(s_a, s_t) + 1) AS i_at,
         GREATEST(0, LEAST(e_l, e_t) - GREATEST(s_l, s_t) + 1) AS i_lt,
         e_a - s_a + 1 AS n_a, e_l - s_l + 1 AS n_l, e_t - s_t + 1 AS n_t
  FROM iv
)
SELECT doc_id,
       CAST(i_al AS DOUBLE) / LEAST(n_a, n_l)        AS overlap_min_angela_lynn,
       CAST(i_al AS DOUBLE) / GREATEST(n_a, n_l)     AS overlap_max_angela_lynn,
       CAST(i_al AS DOUBLE) / (n_a + n_l - i_al)     AS jaccard_angela_lynn,
       CAST(i_at AS DOUBLE) / LEAST(n_a, n_t)        AS overlap_min_angela_thomas,
       CAST(i_at AS DOUBLE) / GREATEST(n_a, n_t)     AS overlap_max_angela_thomas,
       CAST(i_at AS DOUBLE) / (n_a + n_t - i_at)     AS jaccard_angela_thomas,
       CAST(i_lt AS DOUBLE) / LEAST(n_l, n_t)        AS overlap_min_lynn_thomas,
       CAST(i_lt AS DOUBLE) / GREATEST(n_l, n_t)     AS overlap_max_lynn_thomas,
       CAST(i_lt AS DOUBLE) / (n_l + n_t - i_lt)     AS jaccard_lynn_thomas
FROM pairs
"""


# ---------------------------------------------------------------------------
# occlusion_explainability — confidence deltas vs. baseline
# (`preprocessing.py:554-694`)
# ---------------------------------------------------------------------------

def q_occlusion_explainability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline + 4 occlusion experiments per case; the operator joins
    each experiment row back to its baseline and derives score / flip /
    direction / normalized score."""
    d = F.col("doc_id")
    e = F.col("exp")
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .select(
            "doc_id",
            F.explode(F.array(*[F.lit(i) for i in range(5)])).alias("exp"),
        )
        .select(
            F.col("doc_id").alias("id"),
            "exp",
            F.when(e == 0, F.lit("Baseline"))
            .otherwise(F.concat(F.lit("occlusion_"), e.cast("string")))
            .alias("explainability_label"),
            F.when((e > 0) & ((d + e) % 5 == 0), 1 - d % 2)
            .otherwise(d % 2)
            .alias("prediction"),
            F.when(e == 0, (F.lit(50) + d % 50) / F.lit(100.0))
            .otherwise((F.lit(30) + (d * (e + 3)) % 70) / F.lit(100.0))
            .alias("confidence"),
        )
    )
    scored = explainability_scores(rows)
    return scored.select(
        "id",
        "exp",
        "explainability_score",
        "has_flipped",
        F.col("confidence_direction").cast("int").alias("confidence_direction"),
        "norm_explainability_score",
    )


OCCLUSION_ORACLE = """
WITH occ AS (
  SELECT doc_id AS id, e.exp AS exp,
         CASE WHEN (doc_id + e.exp) % 5 = 0 THEN 1 - doc_id % 2
              ELSE doc_id % 2 END AS prediction,
         (50 + doc_id % 50) / 100.0
           - (30 + (doc_id * (e.exp + 3)) % 70) / 100.0 AS score
  FROM documents, (SELECT UNNEST([1, 2, 3, 4]) AS exp) e
)
SELECT id, exp,
       score AS explainability_score,
       prediction != id % 2 AS has_flipped,
       -- direction/normalization key off the OCCLUSION row's own
       -- prediction (occlusion_preprocessing splits on df.prediction),
       -- not the baseline's — they differ exactly on flipped cases
       CAST(CASE WHEN score = 0 THEN 0
                 WHEN prediction = 0 THEN CASE WHEN score > 0 THEN 1 ELSE -1 END
                 ELSE CASE WHEN score > 0 THEN -1 ELSE 1 END
            END AS INTEGER) AS confidence_direction,
       CASE WHEN prediction = 0 THEN score ELSE -score END
         AS norm_explainability_score
FROM occ
"""


# ---------------------------------------------------------------------------
# rouge_token_agreement — the reference's text-similarity IAA scores
# (`scores.py` ROUGE via rouge_scorer) as array-native expressions.
# Token selections are CONSECUTIVE-integer intervals, so the clipped
# n-gram overlap has a closed form the oracle can compute without list
# functions: two intervals share max(0, min(e1,e2)-max(s1,s2)+2-n)
# n-grams (consecutive n-tuples lie in both iff all n members do).
# ---------------------------------------------------------------------------

def q_rouge_token_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from swisscourtrulingcorpus_spark.functions.text import rouge_n_scores

    d = F.col("doc_id")

    def toks(start, end):
        return F.transform(F.sequence(start, end), lambda x: x.cast("string"))

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        toks(F.lit(0), (d % 5) + 4).alias("tokens_a"),
        toks(d % 3, (d % 3) + 5).alias("tokens_b"),
    )
    r1 = rouge_n_scores("tokens_a", "tokens_b", 1)
    r2 = rouge_n_scores("tokens_a", "tokens_b", 2)
    return docs.select(
        "doc_id",
        r1["precision"].alias("rouge1_p"),
        r1["recall"].alias("rouge1_r"),
        r1["f1"].alias("rouge1_f1"),
        r2["precision"].alias("rouge2_p"),
        r2["recall"].alias("rouge2_r"),
        r2["f1"].alias("rouge2_f1"),
    )


ROUGE_ORACLE = """
WITH iv AS (
  SELECT doc_id,
         0 AS s_a, doc_id % 5 + 4 AS e_a,
         doc_id % 3 AS s_b, doc_id % 3 + 5 AS e_b
  FROM documents
), n AS (
  SELECT doc_id,
         GREATEST(0, LEAST(e_a, e_b) - GREATEST(s_a, s_b) + 1) AS i1,
         GREATEST(0, LEAST(e_a, e_b) - GREATEST(s_a, s_b)) AS i2,
         e_a - s_a + 1 AS n_a, e_b - s_b + 1 AS n_b
  FROM iv
), pr AS (
  SELECT doc_id,
         CAST(i1 AS DOUBLE) / n_a AS p1, CAST(i1 AS DOUBLE) / n_b AS r1,
         CAST(i2 AS DOUBLE) / (n_a - 1) AS p2, CAST(i2 AS DOUBLE) / (n_b - 1) AS r2
  FROM n
)
SELECT doc_id,
       p1 AS rouge1_p, r1 AS rouge1_r,
       CASE WHEN p1 + r1 > 0 THEN 2 * p1 * r1 / (p1 + r1) ELSE 0.0 END AS rouge1_f1,
       p2 AS rouge2_p, r2 AS rouge2_r,
       CASE WHEN p2 + r2 > 0 THEN 2 * p2 * r2 / (p2 + r2) ELSE 0.0 END AS rouge2_f1
FROM pr
"""


# ---------------------------------------------------------------------------
# occlusion_test_set — the experiment-set fan-out (experiment_creator):
# one row per annotated span, occluded text by substring arithmetic the
# oracle reproduces with the same 1-based substr semantics
# ---------------------------------------------------------------------------

def q_occlusion_test_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    text = F.concat(F.lit("Der Rekurs wird gutgeheissen weil Grund "),
                    d.cast("string"))
    span = lambda s, ln, lab: F.struct(  # noqa: E731
        s.cast("int").alias("start"),
        ln.cast("int").alias("length"),
        lab.alias("label"),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        text.alias("facts"),
        F.array(
            span(
                F.lit(5) + d % 3,
                F.lit(6),
                F.when(d % 2 == 0, F.lit("Supports judgment")).otherwise(
                    F.lit("Opposes judgment")
                ),
            ),
            span(F.lit(17) + d % 2, F.lit(4), F.lit("Lower court")),
        ).alias("spans"),
    )
    return occlude_spans(docs, "facts", "spans", ["doc_id"])


OCCLUSION_SET_ORACLE = """
WITH base AS (
  SELECT doc_id,
         'Der Rekurs wird gutgeheissen weil Grund ' || CAST(doc_id AS VARCHAR)
           AS t,
         5 + doc_id % 3 AS s1, 17 + doc_id % 2 AS s2
  FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'Supports judgment'
            ELSE 'Opposes judgment' END AS explainability_label,
       substr(t, CAST(s1 AS INTEGER), 6) AS occluded_text,
       substr(t, 1, CAST(s1 - 1 AS INTEGER))
         || substr(t, CAST(s1 + 6 AS INTEGER), length(t)) AS text
FROM base
UNION ALL
SELECT doc_id,
       'Lower court' AS explainability_label,
       substr(t, CAST(s2 AS INTEGER), 4) AS occluded_text,
       substr(t, 1, CAST(s2 - 1 AS INTEGER))
         || substr(t, CAST(s2 + 4 AS INTEGER), length(t)) AS text
FROM base
"""


# ---------------------------------------------------------------------------
# span_token_join — get_span_df as explode + equi-join
# ---------------------------------------------------------------------------

def q_span_token_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: a 10-token stream and one 3-token span at an arithmetic
    offset; the explode+equi-join must recover exactly the member
    tokens with their text."""
    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    tokens = docs.select(
        "doc_id",
        F.lit("a1").alias("annotator"),
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("token_id"),
    ).withColumn(
        "token_text", F.concat(F.lit("T"), F.col("token_id").cast("string"))
    )
    spans = docs.select(
        "doc_id",
        F.lit("a1").alias("annotator"),
        F.lit("Supports judgment").alias("spans_label"),
        (d % 3).alias("token_start"),
        (d % 3 + 2).alias("token_end"),
    )
    return span_tokens(
        spans, tokens, on=["doc_id", "annotator"]
    ).select("doc_id", "annotator", "spans_label", "token_id", "token_text")


SPAN_TOKEN_ORACLE = """
SELECT doc_id,
       'a1' AS annotator,
       'Supports judgment' AS spans_label,
       UNNEST(generate_series(doc_id % 3, doc_id % 3 + 2)) AS token_id,
       'T' || CAST(UNNEST(generate_series(doc_id % 3, doc_id % 3 + 2)) AS VARCHAR)
         AS token_text
FROM documents
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "prodigy_annotation_set",
        q_prodigy_annotation_set,
        PRODIGY_ORACLE,
        "stratified one-per-(year,area,judgment) annotation pick + header span",
    ),
    QuerySpec(
        "iaa_token_agreement",
        q_iaa_token_agreement,
        IAA_ORACLE,
        "pairwise IAA overlap/Jaccard, closed-form interval oracle",
    ),
    QuerySpec(
        "occlusion_explainability",
        q_occlusion_explainability,
        OCCLUSION_ORACLE,
        "occlusion confidence deltas, flips, direction vs baseline",
    ),
    QuerySpec(
        "rouge_token_agreement",
        q_rouge_token_agreement,
        ROUGE_ORACLE,
        "ROUGE-1/2 P/R/F1 as array expressions, closed-form interval oracle",
    ),
    QuerySpec(
        "occlusion_test_set",
        q_occlusion_test_set,
        OCCLUSION_SET_ORACLE,
        "span-occlusion experiment fan-out, substring-arithmetic oracle",
    ),
    QuerySpec(
        "span_token_join",
        q_span_token_join,
        SPAN_TOKEN_ORACLE,
        "span->member-token resolution as explode + equi-join",
    ),
]
