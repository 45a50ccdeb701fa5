"""Kaplan–Meier survival estimation — the churn/retention curve a
behavior pipeline reports over subject lifetimes (Kaplan & Meier 1958,
public; the right-censored complement of the retention-cohort
triangle in `plans/behavior_queries.py`).

The estimator is a per-duration risk table: at each observed duration
t, ``n_risk`` subjects are still under observation, ``n_events`` of
them experience the event (churn) and ``n_censored`` leave
observation event-free.  The survival curve is the running product of
(1 − d_t/r_t) — carried here as a running SUM of micro-int rounded
logs (the `lnc_micro` house style: products become prefix sums, stay
integer-exact, and hash-gate), with S(t) = exp(surv_lnsum_micro/1e6).

Scale shape (100 TB posture): the subject table collapses to the
DISTINCT-DURATION table in one map-side-combined groupBy — the risk
table is bounded by distinct durations, not subjects.  All three
cumulations (the at-risk countdown, the log-survival sum, and the
Greenwood variance sum) run through the shared two-phase
:func:`parallel_prefix_sum` skeleton in TWO passes — the latter two
share one pass via the multi-column ``parallel_prefix_sums`` form —
so no single-task global window ever sees the table; the grand total
is a broadcast-scalar crossJoin (the drift-family pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.operators.classifier import _ln_micro
from swisscourtrulingcorpus_spark.operators.training import (
    parallel_prefix_sum,
    parallel_prefix_sums,
)


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str | Column,
    event_col: str | Column,
) -> DataFrame:
    """KM risk table from a per-subject frame: one row per subject
    with its observed ``duration`` (bigint-castable, ≥ 0) and whether
    the event was OBSERVED (``event_col`` true) or the subject was
    right-censored at that duration (false).

    Output, one row per distinct duration t ascending:
    (duration, n_risk, n_events, n_censored, km_factor_micro,
    surv_lnsum_micro, greenwood_term_p12, greenwood_sum_p12) where
    km_factor_micro = round(ln((r−d)/r)·1e6) (0 when d = 0, NULL when
    d = r — the curve hits exact zero, which has no finite log; by
    construction that can only be the LAST row, since nobody remains
    at risk after it) and surv_lnsum_micro is its running sum (NULL on
    that same terminal row).  greenwood_term_p12 is the Greenwood
    variance increment round(1e12·d/(r·(r−d))) (Greenwood 1926, the
    standard KM confidence band: Var(Ŝ(t)) = Ŝ(t)²·Σ d/(r(r−d))) with
    the same 0-when-d=0 / NULL-when-d=r conventions, and
    greenwood_sum_p12 its running sum.  The Greenwood scale is 1e12,
    NOT the house micro 1e6: each increment is O(1/r²), so at any
    realistic risk-set size (r ≳ 10³) micro-rounding would floor every
    term to 0 and the band would vanish; p12 keeps terms integer-exact
    to r ~ 10⁶ while the sum (≤ Σ (1/(r−d) − 1/r) ≤ 1) stays ≤ ~1e12,
    far inside int64.

    Rows with NULL duration/event are excluded, as are NEGATIVE
    durations (upstream clock-skew artifacts — a subject cannot be
    observed for negative time; filtered rather than folded into the
    risk table so the contract in this docstring matches behavior,
    r10 advice).
    """
    dur = (
        F.col(duration_col) if isinstance(duration_col, str) else duration_col
    )
    ev = F.col(event_col) if isinstance(event_col, str) else event_col
    slim = subjects.select(
        dur.cast("bigint").alias("duration"), ev.cast("boolean").alias("__e")
    ).where(
        F.col("duration").isNotNull()
        & (F.col("duration") >= 0)
        & F.col("__e").isNotNull()
    )
    per = slim.groupBy("duration").agg(
        F.count(F.when(F.col("__e"), 1)).alias("n_events"),
        F.count(F.when(~F.col("__e"), 1)).alias("n_censored"),
    )
    # grand total from the BOUNDED distinct-duration table, not from
    # the corpus-sized slim: value-identical (every subject lands in
    # exactly one per-row), and both consumers now share per's
    # hashpartitioning(duration) exchange, so the upstream subject
    # lineage executes once instead of twice (r10 review)
    total = per.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("__n")
    )
    cum = parallel_prefix_sum(
        per,
        [F.col("duration")],
        F.col("n_events") + F.col("n_censored"),
        "__cum",
    ).crossJoin(F.broadcast(total))
    risk = cum.select(
        "duration",
        (
            F.col("__n") - F.col("__cum") + F.col("n_events")
            + F.col("n_censored")
        ).alias("n_risk"),
        "n_events",
        "n_censored",
    )
    factor = (
        F.when(F.col("n_events") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("n_risk") > F.col("n_events"),
            _ln_micro(
                (F.col("n_risk") - F.col("n_events")) / F.col("n_risk")
            ),
        )
        .otherwise(F.lit(None).cast("bigint"))
    )
    # d·1e12 / (r·(r−d)) as one double expression: r is int64-exact in
    # a double (counts ≪ 2^53) and r·(r−d) as a double avoids the
    # int64 overflow a bigint square would hit past r ~ 3e9
    gw_term = (
        F.when(F.col("n_events") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("n_risk") > F.col("n_events"),
            F.round(
                F.col("n_events").cast("double")
                * F.lit(1e12)
                / (
                    F.col("n_risk").cast("double")
                    * (F.col("n_risk") - F.col("n_events")).cast("double")
                )
            ).cast("bigint"),
        )
        .otherwise(F.lit(None).cast("bigint"))
    )
    with_f = risk.withColumn("km_factor_micro", factor).withColumn(
        "greenwood_term_p12", gw_term
    )
    # the prefix-sum skeleton requires non-null values; the only
    # possible NULL factor/term is the terminal all-die row, whose
    # running sum is itself NULL — coalesce in, mask out.  Both
    # cumulations share ONE pass (the multi-column prefix-sum form).
    summed = parallel_prefix_sums(
        with_f,
        [F.col("duration")],
        [
            (F.coalesce(F.col("km_factor_micro"), F.lit(0)), "__ln"),
            (F.coalesce(F.col("greenwood_term_p12"), F.lit(0)), "__gw"),
        ],
    )
    return summed.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        "km_factor_micro",
        F.when(
            F.col("km_factor_micro").isNotNull(), F.col("__ln")
        ).alias("surv_lnsum_micro"),
        "greenwood_term_p12",
        F.when(
            F.col("greenwood_term_p12").isNotNull(), F.col("__gw")
        ).alias("greenwood_sum_p12"),
    )


def logrank_table(
    subjects: DataFrame,
    duration_col: str | Column,
    event_col: str | Column,
    group_col: str | Column,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample LOG-RANK test table (Mantel 1966 / Peto & Peto 1972,
    public — THE standard companion of the Kaplan–Meier curve: "do
    groups a and b have the same survival?").  One row per distinct
    EVENT duration t ascending, with the hypergeometric
    observed/expected decomposition:

      (duration, n_risk_a, n_risk_b, d_a, d_b,
       e_a_micro  = round(1e6 · d_t·r_a/r_t),
       v_micro    = round(1e6 · d_t·(r_a/r_t)·(1−r_a/r_t)·(r_t−d_t)/(r_t−1)))

    where r_g is group g's at-risk count, d_g its events at t,
    d_t = d_a + d_b, r_t = r_a + r_b (v_micro = 0 when r_t = 1).  The
    caller's statistic is exact integer sums over this table:
    O_a = Σ d_a, E_a = Σ e_a_micro / 1e6, V = Σ v_micro / 1e6,
    z = (O_a − E_a)/√V — the per-duration micro-int emission is the
    `chi2_independence_cells` convention (a float SUM over distributed
    rows is order-dependent; each row's value is one fixed expression
    shape over exact integers, and summing micro-ints is
    order-independent).

    Rows follow :func:`kaplan_meier`'s contract (non-null, duration
    ≥ 0); subjects outside groups a/b are excluded.  Only durations
    with d_t > 0 emit — censoring-only times contribute nothing to
    the statistic, so the table is bounded by distinct EVENT times.

    Scale shape: one (duration) groupBy collapses subjects to the
    distinct-duration table with per-group conditional aggregates;
    BOTH groups' at-risk countdowns come from ONE multi-column
    prefix-sum pass (`parallel_prefix_sums`); the two group totals are
    a broadcast-scalar crossJoin.  Nothing subject-sized shuffles
    twice.
    """
    dur = (
        F.col(duration_col) if isinstance(duration_col, str) else duration_col
    )
    ev = F.col(event_col) if isinstance(event_col, str) else event_col
    grp = F.col(group_col) if isinstance(group_col, str) else group_col
    slim = subjects.select(
        dur.cast("bigint").alias("duration"),
        ev.cast("boolean").alias("__e"),
        grp.alias("__g"),
    ).where(
        F.col("duration").isNotNull()
        & (F.col("duration") >= 0)
        & F.col("__e").isNotNull()
        & F.col("__g").isin([group_a, group_b])
    )
    is_a = F.col("__g") == group_a
    per = slim.groupBy("duration").agg(
        F.count(F.when(is_a & F.col("__e"), 1)).alias("d_a"),
        F.count(F.when(~is_a & F.col("__e"), 1)).alias("d_b"),
        F.count(F.when(is_a, 1)).alias("o_a"),
        F.count(F.when(~is_a, 1)).alias("o_b"),
    )
    total = per.agg(
        F.sum("o_a").alias("__na"), F.sum("o_b").alias("__nb")
    )
    cum = parallel_prefix_sums(
        per,
        [F.col("duration")],
        [(F.col("o_a"), "__ca"), (F.col("o_b"), "__cb")],
    ).crossJoin(F.broadcast(total))
    risk = cum.select(
        "duration",
        (F.col("__na") - F.col("__ca") + F.col("o_a")).alias("n_risk_a"),
        (F.col("__nb") - F.col("__cb") + F.col("o_b")).alias("n_risk_b"),
        "d_a",
        "d_b",
    ).where(F.col("d_a") + F.col("d_b") > 0)
    ra = F.col("n_risk_a").cast("double")
    rt = (F.col("n_risk_a") + F.col("n_risk_b")).cast("double")
    dt = (F.col("d_a") + F.col("d_b")).cast("double")
    e_a = F.round(dt * ra / rt * F.lit(1e6)).cast("bigint")
    v = F.when(
        F.col("n_risk_a") + F.col("n_risk_b") > 1,
        F.round(
            dt
            * (ra / rt)
            * (F.lit(1.0) - ra / rt)
            * (rt - dt)
            / (rt - F.lit(1.0))
            * F.lit(1e6)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return risk.select(
        "duration",
        "n_risk_a",
        "n_risk_b",
        "d_a",
        "d_b",
        e_a.alias("e_a_micro"),
        v.alias("v_micro"),
    )
