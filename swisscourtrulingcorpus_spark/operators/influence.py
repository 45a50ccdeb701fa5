"""Model-guided curation diagnostics over the in-engine NB classifier
(`operators/classifier.py`) — the label-noise / data-valuation layer a
training-data pipeline runs AFTER training its quality model:

- :func:`confident_joint` — the confident-learning label-noise screen
  (Northcutt, Jiang & Chuang, "Confident Learning: Estimating
  Uncertainty in Dataset Labels", JAIR 2021 — public): the joint table
  of (given label, confidently-assigned label); off-diagonal cells are
  the mislabel candidates a curation team reviews.
- :func:`nb_loo_self_influence` — CLOSED-FORM leave-one-out influence:
  NB's sufficient statistics are counts, so "the model trained without
  document d" is pure arithmetic on (cnt_{b,c} − n_b(d),
  T_c − len(d), n_c − 1) — no retraining, no second corpus pass.  A
  doc whose own prediction flips without its own training contribution
  is self-supporting-only: the classic mislabel/outlier signal of
  data-valuation (Koh & Liang influence functions, made exact here by
  NB's count structure).
- :func:`margin_uncertainty_topk` — the active-learning batch
  selection: the k docs the model is least sure about (smallest
  |s_pos − s_neg|), the next docs a labeling budget should buy.

Scale shape (100 TB posture): every diagnostic consumes the slim
per-doc score/feature tables scoring already produces — the text
tokenizes map-side exactly once and never shuffles.  The corpus-sized
work is ONE featurization groupBy; the model-side tables (counts,
totals, priors) are vocab-bounded (≤ 2·n_buckets rows) and broadcast.
All score arithmetic stays in micro-int bigints (the repo's
lm_score_micro pattern), so every diagnostic is hash-gateable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.classifier import (
    _DOC_SENTINEL_B,
    _hashed_buckets,
    _ln_micro,
    nb_stats_table,
    nb_train_from_stats,
    pivot_priors,
)

_I64_MAX = (1 << 63) - 1


def confident_joint(scored: DataFrame) -> DataFrame:
    """Two-class confident joint over a scored table (the output shape
    of `nb_quality_scores`: doc_id, label, s_pos_micro, s_neg_micro,
    pred).  EAGER: the NB train+score chain upstream of ``scored``
    executes at CALL time (the thresholds are driver-side values and
    the ≤ 6 joint rows collect before the cache releases); the
    returned DataFrame is a re-created local frame, not a lazy plan.

    Per class c, the confidence threshold is the MEAN class-oriented
    margin over the docs labeled c — a deliberate MONOTONE-SCORE
    VARIANT of confident learning's per-class mean self-confidence
    threshold, expressed on the micro-int log-odds margin
    m = s_pos − s_neg instead of softmax posteriors.  The margin is
    monotone in NB's posterior, so per-doc ORDERING agrees with the
    paper's score, but a mean over margins is not the image of the
    mean over posteriors (monotone maps preserve order, not means) —
    the qualifying sets can differ from the paper's; the variant is
    chosen because the margin mean stays exact-integer and the whole
    screen hash-gates.  A doc qualifies for c when its oriented margin
    reaches c's threshold; qualification is the EXACT integer
    cross-multiply ``m · n_c ≥ Σ_c m`` — no division anywhere.  A doc
    qualifying for both classes is assigned its argmax (``pred``); for
    neither, assigned is NULL (the "no confident class" bucket of the
    paper).

    Output: (given_label, assigned, n_docs) — the 2×3 joint.  The
    off-diagonal (given ≠ assigned, assigned NOT NULL) counts are the
    label-noise estimate.

    Scale shape: the slim (label, margin, pred) projection is CACHED
    (the `calibration_table` discipline) so the expensive upstream —
    here a full NB train + score chain — executes exactly once: the
    2-row threshold aggregate materializes the cache (a bounded
    collect, the `nb_train` n_all precedent; it also guards the
    cross-class cross-multiply against int64 overflow, which silent
    in-plan arithmetic could not), the grouped count reads it back, and the
    cache is released in `finally` once the ≤ 6 joint rows have
    collected.  Nothing wider than (label, decimal, bool) shuffles.
    """
    # the margin lives in DECIMAL(38,0) end to end — the bigint
    # subtraction, the sum, and the qualification cross-multiply could
    # all overflow int64 on exactly the adversarial inputs the guard
    # below exists to reject (ANSI mode would throw a raw
    # ArithmeticException before the guard ever saw a value), so every
    # margin expression computes in exact decimal; the guard then
    # restores int64 RANGE semantics by raising where the bigint
    # oracle would have overflowed (the raise-on-both-engines
    # convention) (r10 review)
    slim = scored.select(
        F.col("label").cast("boolean").alias("label"),
        (
            F.col("s_pos_micro").cast("decimal(38,0)")
            - F.col("s_neg_micro").cast("decimal(38,0)")
        ).alias("m"),
        F.col("pred").cast("boolean").alias("pred"),
    ).where(F.col("label").isNotNull())
    slim = slim.cache()
    try:
        assigned = _binary_assigned_expr(_binary_margin_stats(slim))
        out = (
            slim.select(
                F.col("label").alias("given_label"),
                assigned.alias("assigned"),
            )
            .groupBy("given_label", "assigned")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("given_label", "assigned")
        )
        # materialize the <= 6 joint rows before releasing the cache
        rows = out.collect()
        schema = out.schema
    finally:
        slim.unpersist()
    return scored.sparkSession.createDataFrame(rows, schema)


def _binary_margin_stats(slim: DataFrame) -> dict:
    """Per-class (Σm, n) over a slim (label, m DECIMAL(38,0)) frame —
    the threshold statistics of the binary confident joint, one
    bounded 2-row collect (the `nb_train` n_all precedent), shared by
    :func:`confident_joint` and :func:`mislabel_candidates` so the
    qualification arithmetic has ONE definition.  Raises where the
    bigint qualification cross-multiply would overflow int64."""
    stats = {
        r["label"]: (int(r["sm"]), int(r["n"]), int(r["mx"]))
        for r in slim.groupBy("label")
        .agg(
            F.sum("m").alias("sm"),
            F.count(F.lit(1)).alias("n"),
            F.max(F.abs(F.col("m"))).alias("mx"),
        )
        .collect()
    }
    # the qualification cross-multiplies EVERY doc's margin by
    # EACH class's count, so the bound is the GLOBAL max margin
    # times the LARGER class — a per-class mx·n check would pass a
    # huge margin in the small class and let the big class's
    # product wrap (r10 review).  The decimal plan arithmetic
    # cannot wrap; the raise keeps parity with the bigint oracle,
    # which WOULD overflow past this bound.
    mx_all = max((s[2] for s in stats.values()), default=0)
    n_max = max((s[1] for s in stats.values()), default=0)
    if mx_all * n_max > _I64_MAX:
        raise ValueError(
            f"margin qualification: max margin·max class count "
            f"{mx_all}·{n_max} exceeds int64 — rescale scores first"
        )
    return stats


def _binary_assigned_expr(stats: dict) -> Column:
    """The confident-class assignment expression over a slim
    (label, m, pred) frame, given :func:`_binary_margin_stats`."""
    sm_pos, n_pos = stats.get(True, (0, 0, 0))[:2]
    sm_neg, n_neg = stats.get(False, (0, 0, 0))[:2]
    # class with zero labeled docs: nothing qualifies for it (the
    # degenerate m·0 ≥ 0 would otherwise qualify EVERY doc)
    q_pos = (
        (F.col("m") * F.lit(n_pos) >= F.lit(sm_pos))
        if n_pos > 0
        else F.lit(False)
    )
    q_neg = (
        (F.col("m") * F.lit(n_neg) <= F.lit(sm_neg))
        if n_neg > 0
        else F.lit(False)
    )
    return (
        F.when(q_pos & q_neg, F.col("pred"))
        .when(q_pos, F.lit(True))
        .when(q_neg, F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def mislabel_candidates(scored: DataFrame) -> DataFrame:
    """The DOC-LEVEL companion of :func:`confident_joint` — the
    actionable curation artifact its 2×3 joint only counts: one row
    per mislabel candidate (assigned NOT NULL and ≠ given label),
    with the margin for review triage.  EAGER like the joint: the
    slim (doc_id, label, m, pred) projection localCheckpoints at call
    time so the NB train+score chain upstream executes exactly once
    (the thresholds need driver-side values anyway); the returned
    frame is a lazy filter over that checkpoint.

    Output: (doc_id, given_label, assigned, margin_micro) — margin is
    the doc's log-odds margin m = s_pos − s_neg, always int64-safe
    here (the stats guard bounds |m|·n_max, hence |m|).  Same
    qualification arithmetic as the joint, by construction: both call
    :func:`_binary_margin_stats` / :func:`_binary_assigned_expr`, so
    per (given, assigned) cell the candidate counts tie out to the
    joint's off-diagonal counts exactly (unit-pinned).

    Scale shape: the checkpoint holds the slim projection only
    (label, decimal, bool per doc); the filter is map-side over it —
    candidates are never collected (unlike the ≤ 6-row joint, the
    candidate list is corpus-fraction-sized)."""
    slim = (
        scored.select(
            "doc_id",
            F.col("label").cast("boolean").alias("label"),
            (
                F.col("s_pos_micro").cast("decimal(38,0)")
                - F.col("s_neg_micro").cast("decimal(38,0)")
            ).alias("m"),
            F.col("pred").cast("boolean").alias("pred"),
        )
        .where(F.col("label").isNotNull())
        .localCheckpoint(eager=True)
    )
    assigned = _binary_assigned_expr(_binary_margin_stats(slim))
    return (
        slim.select(
            "doc_id",
            F.col("label").alias("given_label"),
            assigned.alias("assigned"),
            F.col("m").cast("bigint").alias("margin_micro"),
        )
        .where(
            F.col("assigned").isNotNull()
            & (F.col("assigned") != F.col("given_label"))
        )
    )


def confident_joint_kclass(
    scored: DataFrame,
    doc_col: str = "doc_id",
    given_col: str = "given_label",
    cls_col: str = "cls",
    score_col: str = "score_micro",
) -> DataFrame:
    """K-CLASS confident joint (the generalization of
    :func:`confident_joint` past the binary NB quality model — r10
    verdict "what's wrong" #3) over a DENSE long-format scored table:
    one row per (doc, class) for EVERY class in the label set (missing
    scores coalesced by the caller), ``given_col`` constant per doc
    and a member of the class set, integer scores.  EAGER like the
    binary form: thresholds are driver-side values and the ≤ k·(k+1)
    joint rows collect before the cache releases.

    Per (doc, class) the CLASS-ORIENTED margin is
    m_c(d) = s_c(d) − max_{c'≠c} s_{c'}(d) — the score's lead over the
    best other class — and class c's threshold is the mean of m_c over
    the docs GIVEN c (the same deliberate monotone-score variant of
    the paper's per-class mean self-confidence as the binary form; see
    :func:`confident_joint`).  Qualification is the exact integer
    cross-multiply ``m_c(d) · n_c ≥ Σ_{given=c} m_c``; a doc's
    ASSIGNED class is its highest-scoring qualifying class (score
    ties broken toward the lexically larger class name), NULL when no
    class qualifies.  On 2 classes this degenerates EXACTLY to the
    binary :func:`confident_joint` (m_pos = s_pos − s_neg = −m_neg,
    and the ≥/≤ pair falls out of the orientation; property-pinned in
    tests).  Output: (given_label, assigned, n_docs).

    Scale shape: margins come from ONE window over the (doc, class)
    frame (max / tie-count / second-max per doc — no self-join); the
    cached margin frame feeds the k-row threshold collect (bounded,
    the `nb_train` precedent, which also hosts the int64 overflow
    guard), the broadcast threshold join, and the per-doc assignment
    window, all sharing the doc-hash exchange.  Nothing wider than
    (doc, label, class, decimal) shuffles; k is assumed
    report-bounded (a class-label taxonomy, not a value domain).
    """
    marg = _kclass_margins(
        scored, doc_col, given_col, cls_col, score_col
    ).cache()
    try:
        assigned = _kclass_assigned(marg, _kclass_stats(marg))
        # exactly one (doc, given) row per doc by the density +
        # membership contract: the doc's own-class row
        docs = marg.where(F.col("cls") == F.col("given")).select(
            "doc", "given"
        )
        out = (
            docs.join(assigned, on="doc", how="left")
            .groupBy(
                F.col("given").alias("given_label"), F.col("assigned")
            )
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("given_label", "assigned")
        )
        rows = out.collect()
        schema = out.schema
    finally:
        marg.unpersist()
    return scored.sparkSession.createDataFrame(rows, schema)


def _kclass_margins(
    scored: DataFrame,
    doc_col: str,
    given_col: str,
    cls_col: str,
    score_col: str,
) -> DataFrame:
    """The (doc, given, cls, s, m) margin frame of the k-class joint:
    class-oriented margins m_c = s_c − max other from ONE
    doc-partitioned window."""
    slim = scored.select(
        F.col(doc_col).alias("doc"),
        F.col(given_col).cast("string").alias("given"),
        F.col(cls_col).cast("string").alias("cls"),
        F.col(score_col).cast("decimal(38,0)").alias("s"),
    ).where(
        F.col("given").isNotNull()
        & F.col("cls").isNotNull()
        & F.col("s").isNotNull()
    )
    # two window LAYERS (a window over a windowed column), not nested
    # window calls — the cusum_drift_events precedent: Catalyst fuses
    # both layers into one sort+exchange on doc
    w = Window.partitionBy("doc")
    top = slim.withColumn("__mx", F.max("s").over(w))
    top = top.withColumn(
        "__nmx", F.count(F.when(F.col("s") == F.col("__mx"), 1)).over(w)
    ).withColumn(
        "__mx2",
        F.max(F.when(F.col("s") < F.col("__mx"), F.col("s"))).over(w),
    )
    return top.withColumn(
        "m",
        F.col("s")
        - F.when(
            (F.col("s") == F.col("__mx")) & (F.col("__nmx") == 1),
            F.col("__mx2"),
        ).otherwise(F.col("__mx")),
    ).drop("__mx", "__nmx", "__mx2")


def _kclass_stats(marg: DataFrame) -> dict:
    """Per-class (Σ own-margin, n) thresholds plus the int64 overflow
    guard (global max margin × largest class, the binary guard's
    bound) — ONE k-row bounded collect: the own-row aggregates are
    conditional on cls == given while max|m| spans every row of the
    class's column (r11 review; the `_binary_margin_stats` one-collect
    precedent)."""
    rows = (
        marg.groupBy("cls")
        .agg(
            F.sum(
                F.when(F.col("cls") == F.col("given"), F.col("m"))
            ).alias("sm"),
            F.count(
                F.when(F.col("cls") == F.col("given"), 1)
            ).alias("n"),
            F.max(F.abs(F.col("m"))).alias("mx"),
        )
        .collect()
    )
    stats = {
        r["cls"]: (int(r["sm"]), int(r["n"])) for r in rows if r["n"] > 0
    }
    mx_all = max((int(r["mx"]) for r in rows if r["mx"] is not None), default=0)
    n_max = max((n for _, n in stats.values()), default=0)
    if mx_all * n_max > _I64_MAX:
        raise ValueError(
            f"confident_joint_kclass: max margin·max class count "
            f"{mx_all}·{n_max} exceeds int64 — rescale scores first"
        )
    return stats


def _kclass_assigned(marg: DataFrame, stats: dict) -> DataFrame:
    """Per-doc confident assignment: (doc, assigned) for docs with at
    least one qualifying class — highest qualifying score, ties to
    the lexically larger class."""
    from decimal import Decimal

    th = marg.sparkSession.createDataFrame(
        [(c, Decimal(sm), n) for c, (sm, n) in sorted(stats.items())],
        "cls string, sm decimal(38,0), n long",
    )
    qualified = marg.join(F.broadcast(th), on="cls").where(
        (F.col("n") > 0) & (F.col("m") * F.col("n") >= F.col("sm"))
    )
    wq = Window.partitionBy("doc").orderBy(
        F.col("s").desc(), F.col("cls").desc()
    )
    return (
        qualified.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") == 1)
        .select("doc", F.col("cls").alias("assigned"))
    )


def mislabel_candidates_kclass(
    scored: DataFrame,
    doc_col: str = "doc_id",
    given_col: str = "given_label",
    cls_col: str = "cls",
    score_col: str = "score_micro",
) -> DataFrame:
    """Doc-level mislabel candidates for the K-CLASS joint — the rows
    behind :func:`confident_joint_kclass`'s off-diagonal counts: every
    doc confidently assigned a class other than its given label, with
    the doc's OWN-class margin (how weakly its declared class leads —
    the most-negative margins are the strongest mislabel evidence) for
    review triage.  EAGER like the binary
    :func:`mislabel_candidates`: the margin frame localCheckpoints so
    the scoring chain upstream executes exactly once; the returned
    frame is lazy over the checkpoint.  Same qualification arithmetic
    as the joint by construction (shared margin/stats/assignment
    helpers), so per (given, assigned) cell the candidate counts tie
    out to the joint's off-diagonals exactly (unit-pinned).

    Output: (doc_id, given_label, assigned, own_margin_micro)."""
    marg = _kclass_margins(
        scored, doc_col, given_col, cls_col, score_col
    ).localCheckpoint(eager=True)
    assigned = _kclass_assigned(marg, _kclass_stats(marg))
    own = marg.where(F.col("cls") == F.col("given")).select(
        "doc", "given", F.col("m").cast("bigint").alias("own_margin_micro")
    )
    return (
        own.join(assigned, on="doc")
        .where(F.col("assigned") != F.col("given"))
        .select(
            F.col("doc").alias("doc_id"),
            F.col("given").alias("given_label"),
            "assigned",
            "own_margin_micro",
        )
    )


def margin_uncertainty_topk(scored: DataFrame, k: int = 50) -> DataFrame:
    """Active-learning batch selection: the ``k`` docs with the
    smallest |s_pos − s_neg| (the model's least-confident calls — the
    next docs a labeling budget should buy), ties broken by doc_id so
    the batch is deterministic.

    Scale shape: TakeOrderedAndProject — per-partition top-k heaps,
    one k-row merge on the driver; the scored table never globally
    sorts."""
    m = F.col("s_pos_micro") - F.col("s_neg_micro")
    return (
        scored.select(
            "doc_id",
            "label",
            m.alias("margin_micro"),
            F.abs(m).alias("abs_margin_micro"),
        )
        .orderBy("abs_margin_micro", "doc_id")
        .limit(k)
    )


def nb_loo_self_influence(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: Column | str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Closed-form leave-one-out self-influence under the multinomial
    NB model: for every labeled doc d (label c), the scores the FULL
    model assigns AND the scores of the model retrained WITHOUT d —
    obtained by count arithmetic, never by retraining:

        loglik_loo(b, c) = ln((cnt_{b,c} − n_b(d) + 1) /
                              (T_c − len(d) + B))       per d's buckets
        prior_loo(c)     = ln(n_c / (n + 1))             (own class)
        prior_loo(¬c)    = ln((n_{¬c} + 1) / (n + 1))    (other class)

    (the other class's token likelihoods are untouched — d trained
    only its own class).  Output per doc: (doc_id, label,
    s_pos_micro, s_neg_micro, pred, s_pos_loo_micro, s_neg_loo_micro,
    pred_loo, self_support_micro, self_flip) where self_support is
    the oriented-margin drop (m_full − m_loo) — how much of the doc's
    own classification is self-training — and self_flip marks docs
    whose prediction flips without their own contribution (the
    mislabel/outlier candidates).

    Exactness: every ln argument is an exact ratio of int64-exact
    doubles (counts ≪ 2^53), micro-rounded to bigint — the identical
    arithmetic shape as the NB training oracle, so the whole output
    hash-gates.

    Scale shape: ONE featurization of the corpus (tokens hash
    map-side) and exactly TWO corpus-sized exchanges — the (doc,
    label, b) feature groupBy, then the (doc, label) exchange whose
    partitioning the doc-length window AND the single combined
    aggregation both reuse.  The broadcast model join fans each
    feature row out to both classes, so the full s_pos/s_neg bodies
    and the LOO body come from ONE conditional aggregation — no
    self-join, no second featurization.  The count/total/prior tables
    are vocab-bounded broadcasts; the 2-row class-count collect is
    the bounded `nb_train` precedent.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    labeled = df.select(
        F.col(id_col).alias("doc_id"),
        lab.cast("boolean").alias("label"),
        F.col(text_col).alias("__text"),
    ).where(F.col("label").isNotNull())

    stats = nb_stats_table(
        labeled, "__text", "doc_id", "label", n_buckets
    ).localCheckpoint(eager=True)
    model, prior = nb_train_from_stats(stats, n_buckets)
    cnt = stats.where(F.col("b") >= 0)
    tot = cnt.groupBy("label").agg(F.sum("cnt").alias("tot"))
    ndoc_rows = (
        stats.where(F.col("b") == _DOC_SENTINEL_B)
        .select("label", "cnt")
        .collect()
    )
    n_c = {bool(r["label"]): int(r["cnt"]) for r in ndoc_rows}
    n_all = sum(n_c.values())
    # per-class LOO priors as a 2-row broadcast keyed by the DOC's
    # label: own-class ln(n_c/(n+1)), other-class ln((n_¬c+1)/(n+1))
    spark = df.sparkSession
    pri_loo = spark.createDataFrame(
        [(c,) for c in n_c], "label boolean"
    ).select(
        "label",
        _ln_micro(
            F.when(F.col("label"), F.lit(n_c.get(True, 0)))
            .otherwise(F.lit(n_c.get(False, 0)))
            / F.lit(float(n_all + 1))
        ).alias("p_own_loo"),
        _ln_micro(
            (
                F.when(F.col("label"), F.lit(n_c.get(False, 0)))
                .otherwise(F.lit(n_c.get(True, 0)))
                + 1
            )
            / F.lit(float(n_all + 1))
        ).alias("p_other_loo"),
    )
    # prior of the OTHER class under the full model, keyed by doc label
    pri_other_full = prior.select(
        (~F.col("label")).alias("label"),
        F.col("prior_micro").alias("p_other_full"),
    )
    # full-model priors pivoted to one broadcast row (shared helper)
    pri_full = pivot_priors(prior)

    feats = (
        _hashed_buckets(labeled, "__text", ["doc_id", "label"], n_buckets)
        .groupBy("doc_id", "label", "b")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    w = Window.partitionBy("doc_id", "label")
    feats = feats.withColumn("len", F.sum("n_b").over(w))

    # fan each feature row out to both classes through the broadcast
    # model, carrying the own-class count and total alongside (the cnt
    # join is total where it matters: a doc's buckets necessarily
    # appear in its own class's count table), then ONE conditional
    # aggregation produces the full s_pos/s_neg bodies AND the LOO
    # body — reusing the window's (doc_id, label) partitioning
    fanned = (
        feats.join(
            F.broadcast(model.withColumnRenamed("label", "cls")), on="b"
        )
        .join(
            F.broadcast(
                cnt.select(
                    "b", F.col("label").alias("cls"), F.col("cnt")
                )
            ),
            on=["b", "cls"],
            how="left",
        )
        .join(
            F.broadcast(tot.select(F.col("label").alias("cls"), "tot")),
            on="cls",
            how="left",
        )
    )
    scored = fanned.groupBy("doc_id", "label").agg(
        F.sum(
            F.when(F.col("cls"), F.col("n_b") * F.col("loglik_micro"))
        ).alias("__bp"),
        F.sum(
            F.when(~F.col("cls"), F.col("n_b") * F.col("loglik_micro"))
        ).alias("__bn"),
        F.sum(
            F.when(
                F.col("cls") == F.col("label"),
                F.col("n_b")
                * _ln_micro(
                    (F.col("cnt") - F.col("n_b") + 1)
                    / (F.col("tot") - F.col("len") + n_buckets)
                ),
            )
        ).alias("body"),
    )

    out = (
        scored.crossJoin(F.broadcast(pri_full))
        .select(
            "doc_id",
            "label",
            (F.col("__bp") + F.col("__pp")).alias("s_pos_micro"),
            (F.col("__bn") + F.col("__pn")).alias("s_neg_micro"),
            "body",
        )
        .join(F.broadcast(pri_loo), on="label")
        .join(F.broadcast(pri_other_full), on="label")
        .select(
            "doc_id",
            "label",
            "s_pos_micro",
            "s_neg_micro",
            (F.col("body") + F.col("p_own_loo")).alias("__s_own_loo"),
            (
                F.when(F.col("label"), F.col("s_neg_micro")).otherwise(
                    F.col("s_pos_micro")
                )
                - F.col("p_other_full")
                + F.col("p_other_loo")
            ).alias("__s_other_loo"),
        )
        .select(
            "doc_id",
            "label",
            "s_pos_micro",
            "s_neg_micro",
            (F.col("s_pos_micro") >= F.col("s_neg_micro")).alias("pred"),
            F.when(F.col("label"), F.col("__s_own_loo"))
            .otherwise(F.col("__s_other_loo"))
            .alias("s_pos_loo_micro"),
            F.when(F.col("label"), F.col("__s_other_loo"))
            .otherwise(F.col("__s_own_loo"))
            .alias("s_neg_loo_micro"),
        )
        .select(
            "doc_id",
            "label",
            "s_pos_micro",
            "s_neg_micro",
            "pred",
            "s_pos_loo_micro",
            "s_neg_loo_micro",
            (F.col("s_pos_loo_micro") >= F.col("s_neg_loo_micro")).alias(
                "pred_loo"
            ),
            # oriented to the doc's OWN class: positive = the doc's
            # own-class margin shrinks once its own contribution is
            # removed (self-supporting), for both classes alike
            (
                F.when(F.col("label"), F.lit(1)).otherwise(F.lit(-1))
                * (
                    (F.col("s_pos_micro") - F.col("s_neg_micro"))
                    - (F.col("s_pos_loo_micro") - F.col("s_neg_loo_micro"))
                )
            ).alias("self_support_micro"),
        )
        .withColumn(
            "self_flip", F.col("pred") != F.col("pred_loo")
        )
    )
    return out
