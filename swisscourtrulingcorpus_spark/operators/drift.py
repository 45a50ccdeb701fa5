"""Distribution-drift audits: two-sample KS and Cramér–von Mises,
PSI, JS divergence — each in a per-pair AND a grouped (per-slice,
fleet-wide) form — plus Benjamini–Hochberg FDR control over the
per-slice p-values.

The corpus-drift complement of the time-drift family (CUSUM, the
hourly anomaly flags): given two slices — yesterday's snapshot vs
today's, train vs eval, language A vs B — quantify how far apart two
distributions sit, for ONE pair or for every court/language/spider at
once, and decide which slices to page on with the false-discovery
rate bounded.  All are classical public statistics (Kolmogorov 1933 /
Smirnov 1939; Cramér–von Mises via Anderson 1962; PSI is the standard
model-monitoring index; Jensen–Shannon 1991; Benjamini & Hochberg
1995) computed in the engine's exact-arithmetic house style: integer
counts all the way, one fixed-shape double (or a micro-int rounded
log/exp — the `lnc_micro` precedent in `plans/curation_queries.py`)
at the very end, so Spark and DuckDB produce bit-identical results.

Scale shapes (each documented per function): everything aggregates to
a DISTINCT-VALUE / bin / vocabulary table before any window or join —
row-sized data shuffles once, as its distinct keys; grouped forms
join slice totals in-plan (broadcast on the slice key, zero driver
collects) and the single global prefix sum stays slice-exact because
each slice's deviation terms sum to zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the
    ``value_col`` distributions of groups a and b: D = max over the
    pooled values of |ECDF_a − ECDF_b|, computed entirely in bigint
    arithmetic — |n_b·cum_a(v) − n_a·cum_b(v)| is an exact integer, so
    D = d_num / d_den is ONE fixed-shape double division at the end.
    Returns one row: (n_a, n_b, d_num, d_den, d).

    Scale shape: the input collapses to the DISTINCT-VALUE table
    first (one map-side-combined groupBy), and the cumulative
    difference uses the shared two-phase `parallel_prefix_sum`
    skeleton (range partition → local running sum → broadcast
    offsets) — no single-task global window even when the value
    domain is large.  The two group totals are a 1-row driver
    collect (the calibration-table pattern).
    """
    na, nb, diffed = _two_sample_prefix_diff(
        df, value_col, group_col, group_a, group_b, "ks_two_sample"
    )
    return diffed.agg(F.max(F.abs(F.col("__diff"))).alias("d_num")).select(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.col("d_num").cast("bigint"),
        F.lit(na * nb).cast("bigint").alias("d_den"),
        (
            F.col("d_num").cast("double") / F.lit(float(na * nb))
        ).alias("d"),
    )


def _two_sample_prefix_diff(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    fn_name: str,
):
    """The shared two-sample scaffold behind :func:`ks_two_sample` and
    :func:`cvm_two_sample` (r11 review — one definition of the
    slim/totals/validation/distinct-value/prefix-diff chain): returns
    ``(n_a, n_b, diffed)`` where ``diffed`` is the distinct-value
    table carrying ``__ca``/``__cb`` and the exact integer cumulative
    deviation ``__diff`` = n_b·cum_a − n_a·cum_b over the value
    order.  Raises when either group is empty (per-pair forms have no
    fleet to protect; the grouped forms omit instead)."""
    from swisscourtrulingcorpus_spark.operators.training import (
        parallel_prefix_sum,
    )

    src = df.select(
        F.col(value_col).alias("__v"), F.col(group_col).alias("__g")
    ).where(
        F.col("__v").isNotNull() & F.col("__g").isin([group_a, group_b])
    )
    tot = src.agg(
        F.count(F.when(F.col("__g") == group_a, 1)).alias("na"),
        F.count(F.when(F.col("__g") == group_b, 1)).alias("nb"),
    ).collect()[0]
    na, nb = int(tot.na), int(tot.nb)
    if na == 0 or nb == 0:
        raise ValueError(
            f"{fn_name} needs both groups non-empty, got "
            f"n_a={na}, n_b={nb}"
        )
    per = src.groupBy("__v").agg(
        F.count(F.when(F.col("__g") == group_a, 1)).alias("__ca"),
        F.count(F.when(F.col("__g") == group_b, 1)).alias("__cb"),
    )
    # cum(nb·ca − na·cb) over value order == nb·cumA − na·cumB exactly
    diffed = parallel_prefix_sum(
        per,
        [F.col("__v")],
        F.lit(nb) * F.col("__ca") - F.lit(na) * F.col("__cb"),
        "__diff",
    )
    return na, nb, diffed


def ks_two_sample_by(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    slice_col: str,
) -> DataFrame:
    """The GROUPED form of :func:`ks_two_sample`: one exact two-sample
    KS statistic PER SLICE (per court, per language, per spider…) in a
    single job — the production drift audit "KS of X between snapshots,
    for every slice" that the per-pair form would turn into thousands
    of driver round-trips (r10 verdict "what's wrong" #1).  Output one
    row per slice with both groups non-empty:
    (slice, n_a, n_b, d_num, d_den, d), same exact bigint arithmetic
    as the per-pair form — d_num = max |n_b·cum_a − n_a·cum_b| over
    the slice's value order, d = d_num/(n_a·n_b) one terminal double
    division.  Slices where either group is empty have no defined KS
    and are OMITTED (the per-pair form raises; here one broken slice
    must not kill the fleet-wide report).

    Scale shape — zero driver collects, one prefix-sum pass: per-slice
    totals are JOINED in-plan (broadcast of the slice-sized totals
    table, never a collect), and the cumulative difference runs ONE
    global `parallel_prefix_sum` over the sort key (slice, value).
    That single pass is exact per slice without any offset correction
    because each slice's diff terms sum to exactly zero:
    Σ_slice (n_b·c_a − n_a·c_b) = n_b·n_a − n_a·n_b = 0, so the running
    total re-zeroes at every slice boundary and the within-slice
    prefix IS the slice-local cumulative difference.  The input
    collapses to the per-(slice, value) distinct table first, so
    row-sized data shuffles once, as its distinct keys.
    """
    from swisscourtrulingcorpus_spark.operators.training import (
        parallel_prefix_sum,
    )

    src = df.select(
        F.col(slice_col).alias("__s"),
        F.col(value_col).alias("__v"),
        F.col(group_col).alias("__g"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__v").isNotNull()
        & F.col("__g").isin([group_a, group_b])
    )
    per = src.groupBy("__s", "__v").agg(
        F.count(F.when(F.col("__g") == group_a, 1)).alias("__ca"),
        F.count(F.when(F.col("__g") == group_b, 1)).alias("__cb"),
    )
    tot = per.groupBy("__s").agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    ).where((F.col("__na") > 0) & (F.col("__nb") > 0))
    # broadcast join ON THE SLICE KEY: the totals table is
    # slice-sized, and the join also drops empty-side slices before
    # the prefix sum ever sees their rows
    diffed = parallel_prefix_sum(
        per.join(F.broadcast(tot), on="__s"),
        [F.col("__s"), F.col("__v")],
        F.col("__nb") * F.col("__ca") - F.col("__na") * F.col("__cb"),
        "__diff",
    )
    return (
        diffed.groupBy("__s", "__na", "__nb")
        .agg(F.max(F.abs(F.col("__diff"))).alias("d_num"))
        .select(
            F.col("__s").alias("slice"),
            F.col("__na").cast("bigint").alias("n_a"),
            F.col("__nb").cast("bigint").alias("n_b"),
            F.col("d_num").cast("bigint"),
            (F.col("__na") * F.col("__nb")).cast("bigint").alias("d_den"),
            (
                F.col("d_num").cast("double")
                / (F.col("__na") * F.col("__nb")).cast("double")
            ).alias("d"),
        )
    )


def psi_contrib_micro(
    cnt_a: Column, cnt_b: Column, na: Column, nb: Column
) -> Column:
    """The house PSI contribution expression — ONE definition for the
    static table (:func:`psi_table`), the grouped form
    (:func:`psi_table_by`) and the streaming-register gate
    (`plans/drift_queries.py::incremental_psi_drift`), so a change to
    the rounding/scale convention lands everywhere (r11 review):
    round(1e6·(p_a − p_b)·ln(p_a/p_b)) as bigint, NULL when either
    side's count is 0 (the undefined-bin case, reported rather than
    smoothed away)."""
    pa = cnt_a.cast("double") / na.cast("double")
    pb = cnt_b.cast("double") / nb.cast("double")
    return F.when(
        (cnt_a > 0) & (cnt_b > 0),
        F.round((pa - pb) * F.log(pa / pb) * F.lit(1_000_000.0)).cast(
            "bigint"
        ),
    )


def psi_table(
    df: DataFrame,
    bin_col: Column,
    side_col: Column,
) -> DataFrame:
    """Population Stability Index between the A side (``side_col``
    true) and B side (false) of one table, PER BIN — the standard
    model-monitoring drift index, emitted as per-bin contribution rows
    (the `chi2_independence_cells` pattern: a float SUM over
    distributed cells is order-dependent, while each cell's value is
    one fixed expression shape over exact integer counts).  Per bin:
    (bin, cnt_a, cnt_b, psi_contrib_micro) where psi_contrib_micro =
    round(1e6 · (p_a − p_b)·ln(p_a/p_b)) as a bigint — the micro-int
    rounded-log house style (`lnc_micro`), robust to the one-ulp libm
    differences a raw double log product could expose — and NULL when
    either side's bin count is 0 (the standard PSI undefined-bin
    case, reported rather than smoothed away).

    Scale shape: one (bin, side) groupBy with map-side combine, then a
    bin-sized table crossJoined with the broadcast 1-row totals — the
    input shuffles once, as bins.
    """
    slim = df.select(
        bin_col.cast("bigint").alias("__bin"),
        side_col.cast("boolean").alias("__a"),
    ).where(F.col("__bin").isNotNull() & F.col("__a").isNotNull())
    per = slim.groupBy("__bin").agg(
        F.count(F.when(F.col("__a"), 1)).alias("cnt_a"),
        F.count(F.when(~F.col("__a"), 1)).alias("cnt_b"),
    )
    totals = per.agg(
        F.sum("cnt_a").alias("__na"), F.sum("cnt_b").alias("__nb")
    )
    j = per.crossJoin(F.broadcast(totals))
    contrib = psi_contrib_micro(
        F.col("cnt_a"), F.col("cnt_b"), F.col("__na"), F.col("__nb")
    )
    return j.select(
        F.col("__bin").alias("bin"),
        "cnt_a",
        "cnt_b",
        contrib.alias("psi_contrib_micro"),
    )


def psi_table_by(
    df: DataFrame,
    bin_col: Column,
    side_col: Column,
    slice_col: Column,
) -> DataFrame:
    """The GROUPED form of :func:`psi_table` — per-bin PSI drift
    contributions for EVERY slice in one job (per court, per language,
    per spider…), the PSI companion of :func:`ks_two_sample_by`'s
    fleet-wide audit.  Output one row per (slice, bin):
    (slice, bin, cnt_a, cnt_b, psi_contrib_micro), where the
    probabilities normalize by the SLICE's side totals and the
    contribution follows `psi_table`'s conventions exactly (micro-int
    rounded log, NULL when either side's bin is empty).  Slices where
    an entire SIDE is empty have no defined PSI: all their
    contributions are NULL (cnt 0 on that side in every bin), and the
    per-bin counts still report — one broken slice degrades to counts
    instead of killing the fleet report.

    Scale shape: one (slice, bin) groupBy with map-side combine, then
    the slice-sized totals table joins back as a broadcast on the
    slice key — the input shuffles once, as (slice, bin) pairs; no
    driver collect, no per-slice jobs.
    """
    slim = df.select(
        slice_col.alias("__s"),
        bin_col.cast("bigint").alias("__bin"),
        side_col.cast("boolean").alias("__a"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__bin").isNotNull()
        & F.col("__a").isNotNull()
    )
    per = slim.groupBy("__s", "__bin").agg(
        F.count(F.when(F.col("__a"), 1)).alias("cnt_a"),
        F.count(F.when(~F.col("__a"), 1)).alias("cnt_b"),
    )
    totals = per.groupBy("__s").agg(
        F.sum("cnt_a").alias("__na"), F.sum("cnt_b").alias("__nb")
    )
    j = per.join(F.broadcast(totals), on="__s")
    contrib = psi_contrib_micro(
        F.col("cnt_a"), F.col("cnt_b"), F.col("__na"), F.col("__nb")
    )
    return j.select(
        F.col("__s").alias("slice"),
        F.col("__bin").alias("bin"),
        "cnt_a",
        "cnt_b",
        contrib.alias("psi_contrib_micro"),
    )


def _js_contrib_micro(
    cnt_a: Column, cnt_b: Column, na: Column, nb: Column
) -> Column:
    """The house JS contribution expression — ONE definition for the
    static and grouped forms (the `psi_contrib_micro` convention, r11
    review): ½·(p_a·ln(p_a/m) + p_b·ln(p_b/m)) with m = (p_a+p_b)/2
    and 0·ln(0/m) = 0, micro-int rounded.  Callers must guarantee
    na > 0 and nb > 0 (both forms filter empty sides before this
    evaluates — a 0 total would make p undefined, and non-ANSI Spark
    would silently cast the NaN to 0)."""
    pa = cnt_a.cast("double") / na.cast("double")
    pb = cnt_b.cast("double") / nb.cast("double")
    m = (pa + pb) / F.lit(2.0)
    term_a = F.when(cnt_a > 0, pa * F.log(pa / m)).otherwise(F.lit(0.0))
    term_b = F.when(cnt_b > 0, pb * F.log(pb / m)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.5) * (term_a + term_b) * F.lit(1_000_000.0)
    ).cast("bigint")


def js_token_divergence(
    df: DataFrame,
    token_col: Column,
    side_col: Column,
    min_total: int = 20,
) -> DataFrame:
    """Per-token Jensen–Shannon divergence contributions between the
    token distributions of the A side (``side_col`` true) and B side:
    for each token, contrib = ½·(p_a·ln(p_a/m) + p_b·ln(p_b/m)) with
    m = (p_a + p_b)/2 and the convention 0·ln(0/m) = 0 — the
    vocabulary-drift report ("which tokens shifted between snapshots").
    Probabilities use the FULL token totals (below-threshold tokens
    count toward n_a/n_b); only tokens with cnt_a + cnt_b ≥
    ``min_total`` are EMITTED, bounding the report.  Contributions are
    micro-int rounded logs (`psi_table`'s shape): (token, cnt_a,
    cnt_b, js_contrib_micro), always non-negative by Jensen.

    Scale shape: one (token, side) groupBy collapses the exploded
    tokens to the vocabulary; the totals broadcast back as one row.
    """
    slim = df.select(
        token_col.alias("__t"), side_col.cast("boolean").alias("__a")
    ).where(
        F.col("__t").isNotNull()
        & (F.col("__t") != "")
        & F.col("__a").isNotNull()
    )
    per = slim.groupBy("__t").agg(
        F.count(F.when(F.col("__a"), 1)).alias("cnt_a"),
        F.count(F.when(~F.col("__a"), 1)).alias("cnt_b"),
    )
    # an entirely one-sided input has no defined divergence: the
    # filtered totals make the report EMPTY rather than emitting
    # NaN-cast-to-0 rows (r11 review; the grouped form omits the
    # slice the same way)
    totals = per.agg(
        F.sum("cnt_a").alias("__na"), F.sum("cnt_b").alias("__nb")
    ).where((F.col("__na") > 0) & (F.col("__nb") > 0))
    j = (
        per.where(F.col("cnt_a") + F.col("cnt_b") >= min_total)
        .crossJoin(F.broadcast(totals))
    )
    contrib = _js_contrib_micro(
        F.col("cnt_a"), F.col("cnt_b"), F.col("__na"), F.col("__nb")
    )
    return j.select(
        F.col("__t").alias("token"),
        "cnt_a",
        "cnt_b",
        contrib.alias("js_contrib_micro"),
    )


def cvm_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """EXACT two-sample Cramér–von Mises statistic (Anderson 1962,
    public) between the ``value_col`` distributions of groups a and b —
    the SUM-SQUARED complement of :func:`ks_two_sample`'s max
    deviation (KS sees the single worst ECDF gap; CvM integrates every
    gap, catching distributed small shifts KS under-weights):

        T = n_a·n_b/(n_a+n_b)² · Σ_pooled (F_a(x) − F_b(x))²

    summed over the POOLED observations with multiplicity.  In the
    engine's exact-arithmetic house style: with the integer deviation
    D(v) = n_b·cum_a(v) − n_a·cum_b(v) (KS's exact prefix integer),
    (F_a − F_b)(v) = D(v)/(n_a·n_b), so

        T = Σ_v mult(v)·D(v)²  /  (n_a·n_b·(n_a+n_b)²)

    is ONE exact integer numerator (DECIMAL(38,0) — D² can pass int64)
    over a fixed integer denominator, and T itself is one terminal
    double division.  Returns one row: (n_a, n_b, u_num, u_den, t)
    with the exact numerator/denominator emitted as STRINGS — a
    decimal column round-trips as float64 through DuckDB's pandas
    bridge, so the portable exact representation is the digit string
    (the timestamp-formatting convention).

    Scale shape: identical to :func:`ks_two_sample` — distinct-value
    collapse, the shared two-phase prefix sum, a 1-row totals collect;
    the only addition is the multiplicity-weighted square in the final
    aggregate.
    """
    na, nb, diffed = _two_sample_prefix_diff(
        df, value_col, group_col, group_a, group_b, "cvm_two_sample"
    )
    d_dec = F.col("__diff").cast("decimal(38,0)")
    u = diffed.agg(
        F.sum(
            (F.col("__ca") + F.col("__cb")).cast("decimal(38,0)")
            * d_dec
            * d_dec
        ).alias("u_num")
    )
    den = na * nb * (na + nb) * (na + nb)
    return u.select(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.col("u_num").cast("decimal(38,0)").cast("string").alias("u_num"),
        F.lit(str(den)).alias("u_den"),
        (
            F.col("u_num").cast("double") / F.lit(float(den))
        ).alias("t"),
    )


def js_token_divergence_by(
    df: DataFrame,
    token_col: Column,
    side_col: Column,
    slice_col: Column,
    min_total: int = 20,
) -> DataFrame:
    """The GROUPED form of :func:`js_token_divergence` — per-token JS
    drift contributions for EVERY slice in one job, completing the
    fleet-wide drift trio (grouped KS, grouped PSI, grouped JS).
    Probabilities use each SLICE's full token totals (below-threshold
    tokens count toward the totals); only tokens with
    cnt_a + cnt_b ≥ ``min_total`` WITHIN the slice are emitted.
    Output: (slice, token, cnt_a, cnt_b, js_contrib_micro), same
    conventions as the ungrouped form (micro-int rounded logs,
    0·ln(0/m) = 0, non-negative by Jensen).

    Scale shape: one (slice, token) groupBy collapses the exploded
    tokens; the slice-sized totals table joins back as a broadcast on
    the slice key — no driver collect, no per-slice jobs.
    """
    slim = df.select(
        slice_col.alias("__s"),
        token_col.alias("__t"),
        side_col.cast("boolean").alias("__a"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__t").isNotNull()
        & (F.col("__t") != "")
        & F.col("__a").isNotNull()
    )
    per = slim.groupBy("__s", "__t").agg(
        F.count(F.when(F.col("__a"), 1)).alias("cnt_a"),
        F.count(F.when(~F.col("__a"), 1)).alias("cnt_b"),
    )
    # a slice whose documents all land on one side has no defined
    # divergence and is OMITTED (the ks_two_sample_by convention: one
    # broken slice must not kill the fleet report — and non-ANSI
    # Spark would otherwise cast the 0/0 NaN contributions to 0,
    # reporting an undefined divergence as "no drift"; r11 review)
    totals = per.groupBy("__s").agg(
        F.sum("cnt_a").alias("__na"), F.sum("cnt_b").alias("__nb")
    ).where((F.col("__na") > 0) & (F.col("__nb") > 0))
    j = per.where(
        F.col("cnt_a") + F.col("cnt_b") >= min_total
    ).join(F.broadcast(totals), on="__s")
    contrib = _js_contrib_micro(
        F.col("cnt_a"), F.col("cnt_b"), F.col("__na"), F.col("__nb")
    )
    return j.select(
        F.col("__s").alias("slice"),
        F.col("__t").alias("token"),
        "cnt_a",
        "cnt_b",
        contrib.alias("js_contrib_micro"),
    )


def ks_tail_p_micro(
    d_num: Column, d_den: Column, n_a: Column, n_b: Column
) -> Column:
    """Micro-int one-term Smirnov tail p-value for a two-sample KS
    statistic: p = min(1, 2·e^(−2λ²)) with λ = D·√(n_a·n_b/(n_a+n_b))
    (the standard large-λ tail bound — conservative for λ ≳ 1, the
    regime a drift ALERT cares about), micro-rounded so the one-ulp
    libm differences a raw exp() could expose between engines vanish
    (the `psi_contrib_micro` convention).  All inputs are exact
    integers ≪ 2^53, so λ² is one fixed double expression shape."""
    lam2 = (
        (d_num.cast("double") / d_den.cast("double"))
        * (d_num.cast("double") / d_den.cast("double"))
        * (
            n_a.cast("double")
            * n_b.cast("double")
            / (n_a + n_b).cast("double")
        )
    )
    p = F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * lam2))
    return F.round(p * F.lit(1_000_000.0)).cast("bigint")


def bh_step_up(
    df: DataFrame,
    p_micro_col: str,
    key_col: str,
    alpha_micro: int = 50_000,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    1995, public) over a table of micro-int p-values — the
    multiple-testing layer a fleet-wide drift audit needs before
    alerting: testing thousands of slices at α each would fire ~α·m
    false alarms per sweep; BH bounds the FALSE DISCOVERY RATE at α
    instead.  Ranks the m hypotheses by p ascending (ties broken by
    ``key_col`` for determinism) and rejects every hypothesis with
    rank ≤ k_max, the largest k with p_(k) ≤ (k/m)·α — evaluated as
    the EXACT integer cross-multiply ``p_micro·m ≤ k·alpha_micro``,
    so both engines decide identically.  Output: the input columns
    plus (p_rank, m_tests, significant).

    Scale shape: the input is a REPORT (one row per slice/hypothesis
    — slice-bounded by contract), so the rank/max windows run over a
    report-sized table; the corpus-sized work happened upstream in
    the per-slice statistic.  Not for row-sized inputs."""
    w_rank = Window.orderBy(F.col(p_micro_col).asc(), F.col(key_col).asc())
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.withColumn("p_rank", F.row_number().over(w_rank)).withColumn(
        "m_tests", F.count(F.lit(1)).over(w_all)
    )
    passing = F.when(
        F.col(p_micro_col) * F.col("m_tests")
        <= F.col("p_rank") * F.lit(alpha_micro),
        F.col("p_rank"),
    )
    with_k = ranked.withColumn(
        "__kmax", F.max(passing).over(w_all)
    )
    return with_k.withColumn(
        "significant",
        F.col("p_rank") <= F.coalesce(F.col("__kmax"), F.lit(0)),
    ).drop("__kmax")
