"""Annotation-campaign operators (reference `scrc/annotation/` subtree).

The reference's judgment-explainability analysis is pandas over
annotator CSV/JSONL exports; the query semantics re-expressed here
Spark-first:

- ``explainability_scores`` : occlusion experiments vs. baseline —
  per-case confidence delta, flip detection, confidence direction and
  normalized explainability score
  (`judgment_explainability/analysis/utils/preprocessing.py:554-646`:
  ``occlusion_preprocessing`` / ``calculate_explainability_score`` /
  ``find_flipped_cases`` / ``normalize_exp_score_direction:609-631``).
  The reference loops row-by-row over the baseline frame per occlusion
  row (`preprocessing.py:643-646`) — a driver-side O(n·m) scan; here it
  is ONE broadcast-able equi-join on the case id, then pure column
  arithmetic.  At 100 TB of model outputs the baseline side is one row
  per case and experiment-partitioned occlusions join map-side.

- ``iaa_pairwise_agreement`` : inter-annotator agreement over token
  selections (`.../utils/scores.py:106-184``:
  ``calculate_overlap_min_max`` / ``calculate_jaccard_similarity_
  distance``): for every annotator pair, overlap-min, overlap-max and
  Jaccard over the selected-token sets.  Array-native (``array_
  intersect``/``array_union``) — no UDF, no explode, zero shuffles.

- ``stratified_annotation_pick`` : the prodigy dataset-creation
  selection (`annotation/prodigy_dataset_creation/prodigy_dataset_
  creator.py:80-96`` ``filter_dataset``: keep the FIRST case per
  (year, legal_area, judgment) stratum, input ordered shortest-facts-
  first per ``db_stream:233-236``).  A rank-1 window per stratum — one
  shuffle on the stratum key, skew-free because strata are tiny.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BASELINE_LABEL = "Baseline"


def explainability_scores(
    df: DataFrame,
    id_col: str = "id",
    label_col: str = "explainability_label",
    prediction_col: str = "prediction",
    confidence_col: str = "confidence",
) -> DataFrame:
    """Occlusion rows + baseline rows (label == 'Baseline') in one frame
    -> occlusion rows with ``explainability_score``, ``has_flipped``,
    ``confidence_direction`` and ``norm_explainability_score``.

    Semantics (reference `preprocessing.py`):
      - ``explainability_score``  = baseline confidence - occluded
        confidence for the same case id (``calculate_explainability_
        score:634-646``; the reference takes ``max()`` over baseline
        duplicates, mirrored here with ``F.max``).
      - ``has_flipped``           = occluded prediction != baseline
        prediction (``find_flipped_cases:677-694``).
      - ``confidence_direction``  in {-1, 0, 1} and
        ``norm_explainability_score`` per
        ``normalize_exp_score_direction:609-631``: for prediction 0 the
        direction is the sign of the score and the score is kept; for
        prediction 1 both flip sign (a drop in confidence for the
        opposite class means MORE confidence in the judgment).
    """
    base = (
        df.where(F.col(label_col) == BASELINE_LABEL)
        .groupBy(id_col)
        .agg(
            F.max(confidence_col).alias("_base_confidence"),
            F.max(prediction_col).alias("_base_prediction"),
        )
    )
    occ = df.where(F.col(label_col) != BASELINE_LABEL)
    joined = occ.join(F.broadcast(base), on=id_col, how="left")
    score = F.col("_base_confidence") - F.col(confidence_col)
    pred = F.col(prediction_col)
    sign = F.when(score > 0, F.lit(1)).when(score < 0, F.lit(-1)).otherwise(F.lit(0))
    direction = F.when(score.isNull() | (score == 0), F.lit(0)).otherwise(
        F.when(pred == 0, sign).otherwise(-sign)
    )
    norm = F.when(pred == 0, score).otherwise(-score)
    return (
        joined.withColumn("explainability_score", score)
        .withColumn(
            "has_flipped", F.col(prediction_col) != F.col("_base_prediction")
        )
        .withColumn("confidence_direction", direction)
        .withColumn("norm_explainability_score", norm)
        .drop("_base_confidence", "_base_prediction")
    )


def iaa_pairwise_agreement(
    df: DataFrame,
    token_cols: dict[str, str],
    id_cols: list[str],
) -> DataFrame:
    """Pairwise inter-annotator agreement over token-selection arrays.

    ``token_cols`` maps annotator name -> array column.  For every
    unordered annotator pair emits ``overlap_min_<a>_<b>``,
    ``overlap_max_<a>_<b>`` and ``jaccard_<a>_<b>`` mirroring the
    reference's per-pair score columns (`scores.py`:
    overlap / min(len), overlap / max(len), |∩| / |∪|; empty-vs-empty
    handled as 0.0 like the reference's NaN->0 fill).

    Pure array expressions — stays inside whole-stage codegen.
    """
    out = df
    for a, b in combinations(sorted(token_cols), 2):
        ca = F.array_distinct(F.col(token_cols[a]))
        cb = F.array_distinct(F.col(token_cols[b]))
        inter = F.size(F.array_intersect(ca, cb)).cast("double")
        union = F.size(F.array_union(ca, cb)).cast("double")
        lo = F.least(F.size(ca), F.size(cb)).cast("double")
        hi = F.greatest(F.size(ca), F.size(cb)).cast("double")
        out = (
            out.withColumn(
                f"overlap_min_{a}_{b}",
                F.when(lo > 0, inter / lo).otherwise(F.lit(0.0)),
            )
            .withColumn(
                f"overlap_max_{a}_{b}",
                F.when(hi > 0, inter / hi).otherwise(F.lit(0.0)),
            )
            .withColumn(
                f"jaccard_{a}_{b}",
                F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
            )
        )
    return out.select(*id_cols, *[c for c in out.columns if c not in df.columns])


def span_tokens(
    spans: DataFrame,
    tokens: DataFrame,
    on: list[str],
    start_col: str = "token_start",
    end_col: str = "token_end",
    token_id_col: str = "token_id",
) -> DataFrame:
    """Span → member-token resolution (`preprocessing.py:287-312`
    ``get_span_df``: for every annotated span, the token rows whose ids
    fall in [token_start, token_end] for the same annotation and
    annotator).

    The reference loops span-by-span re-filtering the whole token frame
    (O(spans × tokens), with a ``randint`` dict key as a uniqueness
    hack).  Spark-first the range membership becomes ``explode(
    sequence(start, end))`` — one (span, token_id) pair per member —
    followed by a plain equi-join on ``on + [token_id]``: hash-
    partitionable, no nested-loop range join, cost O(total span length
    + tokens).  Span lengths are annotation-bounded (sentences), so
    the explode fan-out is small and map-side.
    """
    pairs = spans.withColumn(
        token_id_col, F.explode(F.sequence(F.col(start_col), F.col(end_col)))
    ).drop(start_col, end_col)
    return pairs.join(tokens, on=[*on, token_id_col], how="inner")


def occlude_spans(
    df: DataFrame,
    text_col: str,
    spans_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """The occlusion experiment-set fan-out
    (`judgment_explainability/occlusion/experiment_creator.py:28-51`):
    one experiment row per annotated span — ``occluded_text`` is the
    span being removed (the reference's column of that name) and
    ``text`` is the facts with that span cut out (what the model is
    re-run on).

    ``spans_col`` is ``array<struct<start:int, length:int,
    label:string>>`` with 1-based character offsets.  Pure
    explode + substring arithmetic: the 1→N fan-out happens map-side,
    and only the narrow experiment rows shuffle downstream.
    """
    ex = df.select(
        *keep_cols,
        F.col(text_col).alias("_t"),
        F.explode(F.col(spans_col)).alias("_s"),
    )
    start, length = F.col("_s.start"), F.col("_s.length")
    remaining = F.concat(
        F.col("_t").substr(F.lit(1), start - 1),
        F.col("_t").substr(start + length, F.length("_t")),
    )
    return ex.select(
        *keep_cols,
        F.col("_s.label").alias("explainability_label"),
        F.col("_t").substr(start, length).alias("occluded_text"),
        remaining.alias("text"),
    )


def model_near_explanations(
    df: DataFrame,
    id_col: str = "id",
    label_col: str = "explainability_label",
    score_col: str = "norm_explainability_score",
) -> DataFrame:
    """The explanation selection (`judgment_explainability/occlusion/
    explanation_creator.py:23-62` ``model_agg``/``find_indexes``): per
    case and label, the model-nearest explanation is the row with the
    MINIMUM normalized explainability score for 'Supports judgment'
    and the MAXIMUM for 'Opposes judgment'; ties all survive (the
    reference keeps every index at the extremum).

    The reference does groupby-to-lists then numpy argmin/argmax per
    row; here it is one rank window per (id, label) with the sort
    direction keyed on the label — ties share rank 1 and are all kept.
    """
    direction = F.when(
        F.col(label_col) == "Supports judgment", F.col(score_col)
    ).otherwise(-F.col(score_col))
    w = Window.partitionBy(id_col, label_col).orderBy(direction.asc())
    return (
        df.where(
            F.col(label_col).isin("Supports judgment", "Opposes judgment")
        )
        .withColumn("_rk", F.rank().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


#: explainability label -> expected confidence direction
#: (`preprocessing.py:576-588` get_correct_direction: LABELS[1]
#: 'Supports judgment' -> -1, LABELS[2] 'Opposes judgment' -> 1,
#: 'Neutral' -> 0)
NUMERIC_LABELS: dict[str, int] = {
    "Supports judgment": -1,
    "Opposes judgment": 1,
    "Neutral": 0,
}


def correct_direction_counts(
    df: DataFrame,
    label_col: str = "explainability_label",
    direction_col: str = "confidence_direction",
) -> DataFrame:
    """The occlusion-analysis correctness rollup
    (`quantitative_analysis.py:625-630` + `preprocessing.py:576-588`):
    annotate each occlusion row with whether the model's confidence
    moved in the direction the human label predicts, then count per
    (label, correct/incorrect).  Neutral-direction rows (direction 0)
    are excluded first, as in `quantitative_analysis.py:625-626`.

    One narrow groupBy over tiny keys — the 100 TB shape is dominated
    by the upstream score join, not this rollup.
    """
    label_to_num = F.create_map(
        *[F.lit(x) for kv in NUMERIC_LABELS.items() for x in kv]
    )
    return (
        df.where(F.col(direction_col) != 0)
        .withColumn("_numeric_label", label_to_num[F.col(label_col)])
        .withColumn(
            "correct_direction",
            F.col("_numeric_label") == F.col(direction_col),
        )
        .groupBy(label_col, "correct_direction")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def stratified_annotation_pick(
    df: DataFrame,
    strata: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep exactly one row per stratum: the first in ``order_by`` order
    (the prodigy creator's unique-tuple filter over a shortest-facts-
    first stream, `prodigy_dataset_creator.py:80-96,233-236`).

    ``order_by`` must be a total order (include a unique id as the last
    key) so the pick is deterministic on any cluster size.
    """
    w = Window.partitionBy(*strata).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
