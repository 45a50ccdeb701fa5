"""Model-guided curation diagnostics (operators/influence.py) and the
Kaplan-Meier estimator (operators/survival.py): pure-python references,
the closed-form-LOO == actual-retrain equivalence, and the guard/edge
behaviors."""

import math
import random
from collections import Counter, defaultdict

import pytest

# Slow tier (pytest.ini): multi-minute suite, deselected from the
# default run so the round driver's pytest window completes.
pytestmark = pytest.mark.slow


def _round_half_up(x):
    """Spark/DuckDB round() is HALF-UP; python round() is banker's —
    on exactly representable half-integers (e.g. d_t·r_a·1e6/r_t with
    r_t = 128 and an odd product) the two differ, so every pure-python
    reference must round the engines' way (r11 review)."""
    return math.floor(x + 0.5)


# --- confident_joint ------------------------------------------------------


def _scored_df(spark, rows):
    """rows: (doc_id, label, s_pos, s_neg) -> the nb_quality_scores shape."""
    data = [
        (i, lab, sp, sn, sp >= sn) for (i, lab, sp, sn) in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id: long, label: boolean, s_pos_micro: long, "
        "s_neg_micro: long, pred: boolean",
    )


def _cj_reference(rows):
    sm = defaultdict(int)
    n = defaultdict(int)
    for _, lab, sp, sn in rows:
        sm[lab] += sp - sn
        n[lab] += 1
    cnt = Counter()
    for _, lab, sp, sn in rows:
        m, pred = sp - sn, sp >= sn
        qp = n[True] > 0 and m * n[True] >= sm[True]
        qn = n[False] > 0 and m * n[False] <= sm[False]
        a = pred if (qp and qn) else (True if qp else (False if qn else None))
        cnt[(lab, a)] += 1
    return cnt


def test_confident_joint_matches_reference(spark):
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
    )

    rng = random.Random(31)
    rows = [
        (
            i,
            rng.random() < 0.6,
            rng.randrange(-(10**9), 10**9),
            rng.randrange(-(10**9), 10**9),
        )
        for i in range(400)
    ]
    got = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(_scored_df(spark, rows)).collect()
    }
    assert got == dict(_cj_reference(rows))
    # the joint partitions the corpus
    assert sum(got.values()) == len(rows)


def test_confident_joint_single_class_qualifies_nothing_for_missing(spark):
    """With every doc labeled True, no doc may be assigned False via
    the degenerate m*0 >= 0 qualification."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
    )

    rows = [(i, True, 100 * i - 500, 0) for i in range(10)]
    got = confident_joint(_scored_df(spark, rows)).collect()
    assert all(r["assigned"] is not False for r in got)
    assert {(r["given_label"], r["assigned"]): r["n_docs"] for r in got} == (
        dict(_cj_reference(rows))
    )


def test_confident_joint_overflow_guard(spark):
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
    )

    rows = [
        (0, True, (1 << 62), 0),
        (1, True, (1 << 62), 0),
        (2, False, 0, 1),
    ]
    with pytest.raises(ValueError, match="int64"):
        confident_joint(_scored_df(spark, rows))
    # CROSS-CLASS overflow (r10 review): the huge margin lives in the
    # SMALL class, but qualification multiplies it by the BIG class's
    # count — a per-class mx*n check would miss this
    rows = [(i, True, i, 0) for i in range(4)] + [(9, False, (1 << 62), 0)]
    with pytest.raises(ValueError, match="int64"):
        confident_joint(_scored_df(spark, rows))
    # margins whose SUBTRACTION overflows int64 must also reach the
    # guard (decimal margin arithmetic), not wrap or throw mid-plan
    rows = [(0, True, (1 << 62), -(1 << 62)), (1, False, 0, 1)]
    with pytest.raises(ValueError, match="int64"):
        confident_joint(_scored_df(spark, rows))


# --- margin_uncertainty_topk ---------------------------------------------


def test_margin_topk_deterministic_ties(spark):
    from swisscourtrulingcorpus_spark.operators.influence import (
        margin_uncertainty_topk,
    )

    # many exact |margin| ties: selection must break by doc_id
    rows = [(i, True, 7, 0) for i in range(20)] + [
        (100 + i, False, 0, 3) for i in range(20)
    ]
    got = margin_uncertainty_topk(_scored_df(spark, rows), k=25).collect()
    assert [r["doc_id"] for r in got] == sorted(
        i for i, _, sp, sn in rows if abs(sp - sn) == 3
    ) + sorted(i for i, _, sp, sn in rows if abs(sp - sn) == 7)[:5]
    assert all(r["abs_margin_micro"] == abs(r["margin_micro"]) for r in got)
    # k beyond the table returns everything
    assert len(margin_uncertainty_topk(_scored_df(spark, rows), k=99).collect()) == 40


# --- nb_loo_self_influence -------------------------------------------------


_LOO_DOCS = [
    (0, True, "the cat sat on the mat and the dog slept"),
    (1, True, "a quick brown fox jumps over the lazy dog"),
    (2, True, "the rain in spain falls mainly on the plain"),
    (3, True, "to be or not to be that is the question"),
    (4, False, "zzz qqq xxx vvv kkk jjj"),
    (5, False, "qqq qqq zzz zzz unique uncommon glyph"),
    (6, False, "lorem ipsum dolor sit amet zzz"),
    (7, False, "xxx yyy zzz www qqq ppp ooo"),
]


def test_loo_closed_form_equals_actual_retrain(spark):
    """THE property that makes the closed form trustworthy: for every
    doc, the LOO scores must bit-equal scoring the doc against a model
    ACTUALLY retrained on the corpus minus that doc (same micro
    rounding points by construction: loglik ln((cnt-n_b+1)/(T-len+B)),
    priors ln(n_c/(n+1)), ln((n_o+1)/(n+1)))."""
    from swisscourtrulingcorpus_spark.operators.classifier import (
        nb_score_with_model,
        nb_train,
    )
    from swisscourtrulingcorpus_spark.operators.influence import (
        nb_loo_self_influence,
    )

    B = 64
    df = spark.createDataFrame(
        _LOO_DOCS, "doc_id: long, label: boolean, text: string"
    ).cache()
    df.count()
    got = {
        r["doc_id"]: r
        for r in nb_loo_self_influence(
            df, "text", "doc_id", "label", B
        ).collect()
    }
    assert set(got) == {d for d, _, _ in _LOO_DOCS}
    for doc_id, _, _ in _LOO_DOCS:
        rest = df.where(f"doc_id <> {doc_id}")
        model, prior = nb_train(rest, "text", "doc_id", "label", B)
        one = nb_score_with_model(
            df.where(f"doc_id = {doc_id}"),
            "text",
            "doc_id",
            model,
            prior,
            B,
            carry=("label",),
        ).collect()[0]
        assert got[doc_id]["s_pos_loo_micro"] == one["s_pos_micro"], doc_id
        assert got[doc_id]["s_neg_loo_micro"] == one["s_neg_micro"], doc_id
        assert got[doc_id]["pred_loo"] == one["pred"], doc_id
    df.unpersist()


def test_loo_self_support_orientation(spark):
    """self_support is oriented to the doc's own class: for a cleanly
    separated corpus every doc supports its own label (positive), and
    self_flip stays False."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        nb_loo_self_influence,
    )

    df = spark.createDataFrame(
        _LOO_DOCS, "doc_id: long, label: boolean, text: string"
    )
    rows = nb_loo_self_influence(df, "text", "doc_id", "label", 64).collect()
    assert all(r["self_support_micro"] > 0 for r in rows)
    assert all(
        r["self_flip"] == (r["pred"] != r["pred_loo"]) for r in rows
    )


# --- kaplan_meier -----------------------------------------------------------


def _km_reference(subs):
    subs = [(t, e) for t, e in subs if t >= 0]  # mirrors the contract
    d = Counter(t for t, e in subs if e)
    c = Counter(t for t, e in subs if not e)
    out, seen, run, grun = [], 0, 0, 0
    for t in sorted({t for t, _ in subs}):
        r = len(subs) - seen
        dt, ct = d[t], c[t]
        if dt == 0:
            fac, gw = 0, 0
        elif r > dt:
            fac = _round_half_up(math.log((r - dt) / r) * 1e6)
            gw = _round_half_up(dt * 1e12 / (r * (r - dt)))
        else:
            fac, gw = None, None
        run += fac or 0
        grun += gw or 0
        out.append(
            (
                t,
                r,
                dt,
                ct,
                fac,
                run if fac is not None else None,
                gw,
                grun if gw is not None else None,
            )
        )
        seen += dt + ct
    return out


def test_kaplan_meier_matches_reference(spark):
    from swisscourtrulingcorpus_spark.operators.survival import kaplan_meier

    rng = random.Random(37)
    subs = [
        (rng.randrange(0, 40), rng.random() < 0.7) for _ in range(500)
    ]
    df = spark.createDataFrame(subs, "dur: long, ev: boolean")
    got = [
        tuple(r)
        for r in kaplan_meier(df, "dur", "ev").orderBy("duration").collect()
    ]
    assert got == _km_reference(subs)
    # survival curve is non-increasing, n_risk strictly decreasing
    risks = [g[1] for g in got]
    assert risks == sorted(risks, reverse=True) and len(set(risks)) == len(
        risks
    )
    survs = [g[5] for g in got if g[5] is not None]
    assert survs == sorted(survs, reverse=True)
    # Greenwood variance sum is non-negative and non-decreasing
    gws = [g[7] for g in got if g[7] is not None]
    assert gws == sorted(gws) and all(g >= 0 for g in gws)


def test_kaplan_meier_excludes_negative_durations(spark):
    """Negative durations (upstream clock-skew artifacts) are filtered
    like nulls, never folded into the risk table — the docstring's
    >= 0 contract matches behavior (r10 advice)."""
    from swisscourtrulingcorpus_spark.operators.survival import kaplan_meier

    subs = [(-3, True), (-1, False), (0, True), (2, False), (2, True)]
    df = spark.createDataFrame(subs, "dur: long, ev: boolean")
    got = [
        tuple(r)
        for r in kaplan_meier(df, "dur", "ev").orderBy("duration").collect()
    ]
    assert got == _km_reference(subs)  # reference drops t < 0 too
    assert [g[0] for g in got] == [0, 2]
    assert got[0][1] == 3  # n_risk counts only the 3 valid subjects


def test_kaplan_meier_terminal_all_die(spark):
    """When everyone still at risk dies at the final duration the
    factor has no finite log: NULL factor and NULL survival on that
    terminal row ONLY."""
    from swisscourtrulingcorpus_spark.operators.survival import kaplan_meier

    subs = [(1, True), (1, False), (5, True), (5, True)]
    df = spark.createDataFrame(subs, "dur: long, ev: boolean")
    got = kaplan_meier(df, "dur", "ev").orderBy("duration").collect()
    assert [r["duration"] for r in got] == [1, 5]
    assert got[0]["km_factor_micro"] == round(math.log(3 / 4) * 1e6)
    assert got[0]["surv_lnsum_micro"] is not None
    assert got[1]["n_risk"] == 2 and got[1]["n_events"] == 2
    assert got[1]["km_factor_micro"] is None
    assert got[1]["surv_lnsum_micro"] is None


# --- hypothesis property sweeps --------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_scored_rows = st.lists(
    st.tuples(
        st.booleans(),
        st.integers(-(10**6), 10**6),
        st.integers(-(10**6), 10**6),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=_scored_rows)
@settings(**_HSETTINGS)
def test_confident_joint_property(spark, rows):
    """Any scored table (both single-class and two-class draws):
    the joint equals the pure-python reference and partitions the
    corpus."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
    )

    data = [(i, lab, sp, sn) for i, (lab, sp, sn) in enumerate(rows)]
    got = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(_scored_df(spark, data)).collect()
    }
    assert got == dict(_cj_reference(data))
    assert sum(got.values()) == len(data)


_subjects = st.lists(
    st.tuples(st.integers(0, 12), st.booleans()), min_size=1, max_size=60
)


@given(subs=_subjects)
@settings(**_HSETTINGS)
def test_kaplan_meier_property(spark, subs):
    """Any censoring pattern (hypothesis finds the all-die, the
    all-censored, and interleaved terminal shapes): the risk table
    equals the pure-python reference row for row."""
    from swisscourtrulingcorpus_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(subs, "dur: long, ev: boolean")
    got = [
        tuple(r)
        for r in kaplan_meier(df, "dur", "ev").orderBy("duration").collect()
    ]
    assert got == _km_reference(subs)


def test_confident_joint_over_incremental_model_equals_batch(spark):
    """End-to-end composition: a model trained INCREMENTALLY (three
    batches of stats merged through nb_merge_counts) must yield the
    exact batch-trained confident joint — the diagnostics layer
    inherits the never-rescan-history contract of the stats store."""
    from functools import reduce

    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.classifier import (
        nb_merge_counts,
        nb_score_with_model,
        nb_stats_table,
        nb_train,
        nb_train_from_stats,
    )
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
    )

    B = 64
    docs = spark.createDataFrame(
        [
            (i, i % 2 == 0, f"tok{i % 7} tok{i % 5} common word {i % 3}")
            for i in range(30)
        ],
        "doc_id: long, label: boolean, text: string",
    )
    # incremental: three disjoint batches -> merged stats -> model
    stats = [
        nb_stats_table(
            docs.where(F.col("doc_id") % 3 == k), "text", "doc_id", "label", B
        )
        for k in range(3)
    ]
    merged = reduce(nb_merge_counts, stats)
    model_i, prior_i = nb_train_from_stats(merged, B)
    scored_i = nb_score_with_model(
        docs.select("doc_id", "label", F.col("text").alias("__t")),
        "__t",
        "doc_id",
        model_i,
        prior_i,
        B,
        carry=("label",),
    )
    # batch: one-shot training over the full corpus
    model_b, prior_b = nb_train(docs, "text", "doc_id", "label", B)
    scored_b = nb_score_with_model(
        docs.select("doc_id", "label", F.col("text").alias("__t")),
        "__t",
        "doc_id",
        model_b,
        prior_b,
        B,
        carry=("label",),
    )
    joint_i = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(scored_i).collect()
    }
    joint_b = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(scored_b).collect()
    }
    assert joint_i == joint_b and sum(joint_i.values()) == 30


# --- mislabel_candidates ---------------------------------------------------


def test_mislabel_candidates_tie_to_joint_offdiagonal(spark):
    """The candidate list is the joint's off-diagonal, row for row:
    per (given, assigned) cell the candidate count equals the joint's
    count, every candidate's margin matches its scored row, and no
    on-diagonal or unassigned doc appears (shared qualification
    expressions by construction)."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
        mislabel_candidates,
    )

    rng = random.Random(43)
    rows = [
        (
            i,
            rng.random() < 0.5,
            rng.randrange(-(10**6), 10**6),
            rng.randrange(-(10**6), 10**6),
        )
        for i in range(300)
    ]
    joint = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(_scored_df(spark, rows)).collect()
    }
    cands = mislabel_candidates(_scored_df(spark, rows)).collect()
    assert all(
        r["assigned"] is not None and r["assigned"] != r["given_label"]
        for r in cands
    )
    by_cell = Counter((r["given_label"], r["assigned"]) for r in cands)
    off = {
        cell: cnt
        for cell, cnt in joint.items()
        if cell[1] is not None and cell[1] != cell[0]
    }
    assert dict(by_cell) == off
    margins = {i: sp - sn for i, _, sp, sn in rows}
    assert all(r["margin_micro"] == margins[r["doc_id"]] for r in cands)


# --- confident_joint_kclass -------------------------------------------------


def _kclass_df(spark, rows):
    """rows: (doc, given, {cls: score}) -> dense long format."""
    data = [
        (doc, given, c, s) for doc, given, sc in rows for c, s in sc.items()
    ]
    return spark.createDataFrame(
        data, "doc_id: long, given_label: string, cls: string, "
        "score_micro: long"
    )


def _kclass_reference(rows):
    classes = sorted({c for _, _, sc in rows for c in sc})
    marg = {}
    for doc, _, sc in rows:
        for c in classes:
            marg[(doc, c)] = sc[c] - max(sc[o] for o in classes if o != c)
    sm, n = defaultdict(int), defaultdict(int)
    for doc, given, _ in rows:
        sm[given] += marg[(doc, given)]
        n[given] += 1
    cnt = Counter()
    for doc, given, sc in rows:
        qual = [
            c
            for c in classes
            if n[c] > 0 and marg[(doc, c)] * n[c] >= sm[c]
        ]
        a = max(qual, key=lambda c: (sc[c], c)) if qual else None
        cnt[(given, a)] += 1
    return cnt


def test_kclass_joint_matches_reference(spark):
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint_kclass,
    )

    rng = random.Random(47)
    classes = ["de", "en", "fr"]
    rows = [
        (
            i,
            rng.choice(classes),
            {c: rng.randrange(0, 10**6) for c in classes},
        )
        for i in range(300)
    ]
    got = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint_kclass(_kclass_df(spark, rows)).collect()
    }
    assert got == dict(_kclass_reference(rows))
    assert sum(got.values()) == len(rows)


def test_kclass_joint_degenerates_to_binary(spark):
    """On 2 classes the k-class joint equals the binary
    confident_joint cell for cell (True -> 'p', False -> 'n'): the
    class-oriented margin m_pos = s_pos - s_neg = -m_neg reproduces
    the binary >=/<= qualification pair, argmax assignment and
    tie-breaks included."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint,
        confident_joint_kclass,
    )

    rng = random.Random(53)
    rows = [
        (
            i,
            rng.random() < 0.6,
            rng.randrange(-(10**5), 10**5),
            rng.randrange(-(10**5), 10**5),
        )
        for i in range(250)
    ]
    # force some exact score ties to exercise the tie-break parity
    rows += [(1000 + i, i % 2 == 0, 777, 777) for i in range(6)]
    binary = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint(_scored_df(spark, rows)).collect()
    }
    lab = {True: "p", False: "n"}
    krows = [
        (i, lab[g], {"p": sp, "n": sn}) for i, g, sp, sn in rows
    ]
    kres = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint_kclass(_kclass_df(spark, krows)).collect()
    }
    mapped = {
        (lab[g], lab[a] if a is not None else None): c
        for (g, a), c in binary.items()
    }
    assert kres == mapped


def test_kclass_joint_overflow_guard(spark):
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint_kclass,
    )

    rows = [
        (0, "a", {"a": 1 << 62, "b": -(1 << 62), "c": 0}),
        (1, "b", {"a": 0, "b": 1, "c": 0}),
        (2, "b", {"a": 0, "b": 2, "c": 0}),
    ]
    with pytest.raises(ValueError, match="int64"):
        confident_joint_kclass(_kclass_df(spark, rows))


def test_kclass_mislabel_candidates_tie_to_joint(spark):
    """K-class candidate rows are the joint's off-diagonal, cell for
    cell, and each candidate's own-class margin matches the reference
    margin (shared margin/threshold/assignment helpers by
    construction)."""
    from swisscourtrulingcorpus_spark.operators.influence import (
        confident_joint_kclass,
        mislabel_candidates_kclass,
    )

    rng = random.Random(59)
    classes = ["de", "en", "fr", "it"]
    rows = [
        (
            i,
            rng.choice(classes),
            {c: rng.randrange(0, 10**5) for c in classes},
        )
        for i in range(250)
    ]
    joint = {
        (r["given_label"], r["assigned"]): r["n_docs"]
        for r in confident_joint_kclass(_kclass_df(spark, rows)).collect()
    }
    cands = mislabel_candidates_kclass(_kclass_df(spark, rows)).collect()
    assert all(r["assigned"] != r["given_label"] for r in cands)
    by_cell = Counter((r["given_label"], r["assigned"]) for r in cands)
    off = {
        cell: cnt
        for cell, cnt in joint.items()
        if cell[1] is not None and cell[1] != cell[0]
    }
    assert dict(by_cell) == off and len(off) > 0
    # own-class margin = own score minus best other class
    margins = {
        i: sc[g] - max(s for c, s in sc.items() if c != g)
        for i, g, sc in rows
    }
    assert all(
        r["own_margin_micro"] == margins[r["doc_id"]] for r in cands
    )


# --- logrank_table ----------------------------------------------------------


def _logrank_reference(subs):
    """subs: (duration, event, group_is_a). Per event-time rows."""
    subs = [(t, e, a) for t, e, a in subs if t >= 0]
    na = sum(1 for _, _, a in subs if a)
    nb = len(subs) - na
    seen_a = seen_b = 0
    out = []
    for t in sorted({t for t, _, _ in subs}):
        at = [(e, a) for tt, e, a in subs if tt == t]
        d_a = sum(1 for e, a in at if e and a)
        d_b = sum(1 for e, a in at if e and not a)
        o_a = sum(1 for _, a in at if a)
        o_b = len(at) - o_a
        ra, rb = na - seen_a, nb - seen_b
        seen_a += o_a
        seen_b += o_b
        dt, rt = d_a + d_b, ra + rb
        if dt == 0:
            continue
        e_a = _round_half_up(dt * ra / rt * 1e6)
        if rt > 1:
            v = _round_half_up(
                dt * (ra / rt) * (1 - ra / rt) * (rt - dt) / (rt - 1) * 1e6
            )
        else:
            v = 0
        out.append((t, ra, rb, d_a, d_b, e_a, v))
    return out


def test_logrank_matches_reference(spark):
    from swisscourtrulingcorpus_spark.operators.survival import logrank_table

    rng = random.Random(61)
    subs = [
        (rng.randrange(0, 30), rng.random() < 0.6, rng.random() < 0.5)
        for _ in range(600)
    ]
    df = spark.createDataFrame(
        [(t, e, "A" if a else "B") for t, e, a in subs],
        "dur: long, ev: boolean, g: string",
    )
    got = [
        tuple(r)
        for r in logrank_table(df, "dur", "ev", "g", "A", "B")
        .orderBy("duration")
        .collect()
    ]
    assert got == _logrank_reference(subs)
    # identical survival in both groups -> O ~= E in aggregate only;
    # structural invariants that must hold exactly:
    for t, ra, rb, d_a, d_b, e_a, v in got:
        assert d_a <= ra and d_b <= rb
        assert 0 <= e_a <= (d_a + d_b) * 10**6
        assert v >= 0


def test_logrank_same_distribution_small_statistic(spark):
    """Two identical groups: z = (O-E)/sqrt(V) stays small (sanity on
    the statistic's composition from the table)."""
    from swisscourtrulingcorpus_spark.operators.survival import logrank_table

    rng = random.Random(67)
    subs = [
        (rng.randrange(0, 20), rng.random() < 0.7, i % 2 == 0)
        for i in range(1000)
    ]
    df = spark.createDataFrame(
        [(t, e, "A" if a else "B") for t, e, a in subs],
        "dur: long, ev: boolean, g: string",
    )
    rows = logrank_table(df, "dur", "ev", "g", "A", "B").collect()
    o = sum(r["d_a"] for r in rows)
    e = sum(r["e_a_micro"] for r in rows) / 1e6
    v = sum(r["v_micro"] for r in rows) / 1e6
    z = (o - e) / math.sqrt(v)
    assert abs(z) < 3.5  # same distribution by construction
