"""Unit tests for the annotation-campaign operators
(`swisscourtrulingcorpus_spark/operators/annotation.py`), pinning the
reference semantics on hand-built frames:

- occlusion explainability (`judgment_explainability/analysis/utils/
  preprocessing.py:554-694`): score = baseline - occluded confidence,
  flip detection, direction/normalization keyed on the occlusion row's
  own prediction, max() over duplicated baselines.
- IAA pairwise agreement (`.../utils/scores.py`): overlap-min/max and
  Jaccard per annotator pair, empty selections -> 0.0.
- prodigy stratified pick (`prodigy_dataset_creator.py:80-96`):
  first-per-stratum with a deterministic total order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.annotation import (
    explainability_scores,
    iaa_pairwise_agreement,
    stratified_annotation_pick,
)


def test_explainability_scores_semantics(spark):
    rows = [
        # id 1: baseline pred 0 conf .8; occlusion drops conf -> score>0,
        # pred stays 0 -> direction +1, norm = score
        ("1", "Baseline", 0, 0.8),
        ("1", "occlusion_1", 0, 0.6),
        # id 1 second experiment: flipped prediction -> direction/norm
        # keyed on the OCCLUSION prediction (1), sign flips
        ("1", "occlusion_2", 1, 0.7),
        # id 2: duplicated baseline rows -> max() wins (reference .max())
        ("2", "Baseline", 1, 0.5),
        ("2", "Baseline", 1, 0.9),
        ("2", "occlusion_1", 1, 0.9),  # score 0 -> direction 0
    ]
    df = spark.createDataFrame(
        rows, ["id", "explainability_label", "prediction", "confidence"]
    )
    out = {
        (r["id"], r["explainability_label"]): r
        for r in explainability_scores(df).collect()
    }
    assert len(out) == 3  # baseline rows are not re-emitted

    r11 = out[("1", "occlusion_1")]
    assert r11["explainability_score"] == pytest.approx(0.2)
    assert r11["has_flipped"] is False
    assert r11["confidence_direction"] == 1
    assert r11["norm_explainability_score"] == pytest.approx(0.2)

    r12 = out[("1", "occlusion_2")]
    assert r12["explainability_score"] == pytest.approx(0.1)
    assert r12["has_flipped"] is True
    assert r12["confidence_direction"] == -1  # pred 1: sign flipped
    assert r12["norm_explainability_score"] == pytest.approx(-0.1)

    r21 = out[("2", "occlusion_1")]
    assert r21["explainability_score"] == pytest.approx(0.0)
    assert r21["confidence_direction"] == 0
    assert r21["has_flipped"] is False


def test_iaa_pairwise_agreement_scores(spark):
    df = spark.createDataFrame(
        [
            # identical selections -> all scores 1.0
            (1, [1, 2, 3], [1, 2, 3], [1, 2, 3]),
            # disjoint a/b, c empty -> zeros (reference NaN->0 fill)
            (2, [1, 2], [3, 4], []),
            # partial overlap: a={1,2,3,4}, b={3,4,5,6}: inter 2,
            # union 6, min/max len 4
            (3, [1, 2, 3, 4], [3, 4, 5, 6], [1]),
        ],
        ["doc_id", "tokens_angela", "tokens_lynn", "tokens_thomas"],
    )
    out = {
        r["doc_id"]: r
        for r in iaa_pairwise_agreement(
            df,
            token_cols={
                "angela": "tokens_angela",
                "lynn": "tokens_lynn",
                "thomas": "tokens_thomas",
            },
            id_cols=["doc_id"],
        ).collect()
    }
    assert out[1]["jaccard_angela_lynn"] == 1.0
    assert out[1]["overlap_min_angela_lynn"] == 1.0
    assert out[2]["jaccard_angela_lynn"] == 0.0
    assert out[2]["overlap_min_angela_thomas"] == 0.0  # empty side -> 0
    assert out[3]["jaccard_angela_lynn"] == pytest.approx(2 / 6)
    assert out[3]["overlap_min_angela_lynn"] == pytest.approx(2 / 4)
    assert out[3]["overlap_max_angela_lynn"] == pytest.approx(2 / 4)
    assert out[3]["overlap_min_angela_thomas"] == pytest.approx(1 / 1)
    assert out[3]["overlap_max_angela_thomas"] == pytest.approx(1 / 4)


def test_stratified_annotation_pick_first_per_stratum(spark):
    df = spark.createDataFrame(
        [
            (2015, "penal_law", "approval", 300, 10),
            (2015, "penal_law", "approval", 100, 11),  # shortest wins
            (2015, "penal_law", "approval", 100, 12),  # tie -> lower id
            (2016, "civil_law", "dismissal", 500, 13),
        ],
        ["year", "legal_area", "judgment", "facts_len", "doc_id"],
    )
    picked = stratified_annotation_pick(
        df,
        strata=["year", "legal_area", "judgment"],
        order_by=[F.col("facts_len"), F.col("doc_id")],
    ).collect()
    by_stratum = {(r["year"], r["legal_area"], r["judgment"]): r for r in picked}
    assert len(picked) == 2
    assert by_stratum[(2015, "penal_law", "approval")]["doc_id"] == 11
    assert by_stratum[(2016, "civil_law", "dismissal")]["doc_id"] == 13


def test_rouge_and_bleu_scores(spark):
    from swisscourtrulingcorpus_spark.functions.text import (
        bleu_score,
        rouge_n_scores,
    )

    df = spark.createDataFrame(
        [
            # identical -> all 1.0
            (1, ["a", "b", "c", "d"], ["a", "b", "c", "d"]),
            # clipped counts: cand the*3 vs ref the,cat ->
            # overlap min(3,1)=1, p=1/3, r=1/2, f1=0.4
            (2, ["the", "the", "the"], ["the", "cat"]),
            # 4/5 unigrams, 3/4 bigrams shared; BLEU =
            # (0.8 * 0.75 * (2/3) * 0.5)^(1/4) with BP=1
            (3, ["a", "b", "c", "d", "e"], ["a", "b", "c", "d", "x"]),
            # disjoint -> zeros
            (4, ["a", "b"], ["x", "y"]),
        ],
        ["i", "cand", "ref"],
    )
    r1 = rouge_n_scores("cand", "ref", 1)
    r2 = rouge_n_scores("cand", "ref", 2)
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            r1["precision"].alias("p1"),
            r1["recall"].alias("r1"),
            r1["f1"].alias("f1"),
            r2["f1"].alias("f2"),
            bleu_score("cand", "ref").alias("bleu"),
        ).collect()
    }
    assert out[1]["f1"] == 1.0 and out[1]["f2"] == 1.0 and out[1]["bleu"] == 1.0
    assert out[2]["p1"] == pytest.approx(1 / 3)
    assert out[2]["r1"] == pytest.approx(1 / 2)
    assert out[2]["f1"] == pytest.approx(0.4)
    assert out[2]["bleu"] == 0.0  # no shared bigram -> unsmoothed zero
    assert out[3]["bleu"] == pytest.approx((0.8 * 0.75 * (2 / 3) * 0.5) ** 0.25)
    assert out[4]["f1"] == 0.0 and out[4]["bleu"] == 0.0


def test_rouge_multichar_tokens_no_boundary_collision(spark):
    from swisscourtrulingcorpus_spark.functions.text import rouge_n_scores

    # ["ab","c"] vs ["a","bc"] must NOT collide as bigrams (U+0001
    # separator keeps token boundaries)
    df = spark.createDataFrame([(["ab", "c"], ["a", "bc"])], ["cand", "ref"])
    r2 = rouge_n_scores("cand", "ref", 2)
    assert df.select(r2["f1"].alias("f")).collect()[0]["f"] == 0.0


def test_correct_direction_counts(spark):
    from swisscourtrulingcorpus_spark.operators.annotation import (
        correct_direction_counts,
    )

    df = spark.createDataFrame(
        [
            # label expects -1; direction -1 -> correct
            ("Supports judgment", -1),
            ("Supports judgment", 1),   # incorrect
            ("Opposes judgment", 1),    # correct
            ("Opposes judgment", 0),    # neutral direction -> excluded
            ("Neutral", 1),             # label expects 0 -> incorrect
        ],
        ["explainability_label", "confidence_direction"],
    )
    out = {
        (r["explainability_label"], r["correct_direction"]): r["n"]
        for r in correct_direction_counts(df).collect()
    }
    assert out[("Supports judgment", True)] == 1
    assert out[("Supports judgment", False)] == 1
    assert out[("Opposes judgment", True)] == 1
    assert out[("Neutral", False)] == 1
    assert ("Opposes judgment", False) not in out  # the excluded row


def test_occlude_spans_fanout(spark):
    from swisscourtrulingcorpus_spark.operators.annotation import occlude_spans

    df = spark.createDataFrame(
        [
            (
                "c1",
                "Hello brave world",
                [
                    {"start": 7, "length": 6, "label": "Supports judgment"},
                    {"start": 1, "length": 6, "label": "Lower court"},
                ],
            )
        ],
        "id string, facts string, spans array<struct<start:int,length:int,label:string>>",
    )
    out = {
        r["explainability_label"]: r
        for r in occlude_spans(df, "facts", "spans", ["id"]).collect()
    }
    assert out["Supports judgment"]["occluded_text"] == "brave "
    assert out["Supports judgment"]["text"] == "Hello world"
    assert out["Lower court"]["occluded_text"] == "Hello "
    assert out["Lower court"]["text"] == "brave world"


def test_model_near_explanations_extrema_with_ties(spark):
    from swisscourtrulingcorpus_spark.operators.annotation import (
        model_near_explanations,
    )

    df = spark.createDataFrame(
        [
            # Supports: min wins (two tied minima both kept)
            ("c1", "Supports judgment", 0.1, "s-a"),
            ("c1", "Supports judgment", 0.1, "s-b"),
            ("c1", "Supports judgment", 0.9, "s-c"),
            # Opposes: max wins
            ("c1", "Opposes judgment", 0.2, "o-a"),
            ("c1", "Opposes judgment", 0.8, "o-b"),
            # other labels are dropped
            ("c1", "Lower court", 0.5, "lc"),
        ],
        ["id", "explainability_label", "norm_explainability_score", "sent"],
    )
    out = model_near_explanations(df)
    got = {(r["explainability_label"], r["sent"]) for r in out.collect()}
    assert got == {
        ("Supports judgment", "s-a"),
        ("Supports judgment", "s-b"),
        ("Opposes judgment", "o-b"),
    }


def test_span_tokens_membership(spark):
    from swisscourtrulingcorpus_spark.operators.annotation import span_tokens

    tokens = spark.createDataFrame(
        [(1, "a1", t, f"w{t}") for t in range(6)]
        + [(1, "a2", t, f"w{t}") for t in range(6)],
        ["ann", "annotator", "token_id", "token_text"],
    )
    spans = spark.createDataFrame(
        [
            (1, "a1", "Supports judgment", 1, 3),
            (1, "a2", "Opposes judgment", 4, 5),
        ],
        ["ann", "annotator", "spans_label", "token_start", "token_end"],
    )
    out = span_tokens(spans, tokens, on=["ann", "annotator"]).collect()
    got = {(r["annotator"], r["token_id"]) for r in out}
    # a1's span picks tokens 1-3 from a1's stream only; a2's picks 4-5
    assert got == {("a1", 1), ("a1", 2), ("a1", 3), ("a2", 4), ("a2", 5)}
    assert all(r["token_text"] == f"w{r['token_id']}" for r in out)
