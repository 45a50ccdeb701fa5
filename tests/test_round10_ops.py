"""Round-10 operator tests: batched exact selection, selection
survivor persistence, lead-lag key-cardinality guard, CMS zero-bucket
depth handling, and the variance-clamp hardening."""

import random

import pytest


def test_exact_kth_values_batch_equals_per_k(spark):
    """The batched selection must return, for EVERY requested rank,
    exactly the sorted k-th element — identical to what per-k
    `exact_kth_value` calls return — from one shared narrowing loop
    (agg_passes bounded by rounds+1, NOT by |ks|)."""
    from swisscourtrulingcorpus_spark.operators.relational import (
        exact_kth_value,
        exact_kth_values,
    )

    rng = random.Random(23)
    vals = [rng.randrange(-(10**7), 10**7) for _ in range(3000)] + [42] * 40
    df = spark.createDataFrame([(v,) for v in vals], "v: long").cache()
    df.count()
    sv = sorted(vals)
    n = len(vals)
    ks = [1, 2, n // 10, n // 4, n // 2, n // 2 + 1, 3 * n // 4, n - 1, n]
    stats = {}
    got = exact_kth_values(df, "v", ks, bins=64, _stats=stats)
    assert set(got) == set(ks)
    for k in ks:
        assert got[k] == sv[k - 1]
        assert exact_kth_value(df, "v", k, bins=64) == sv[k - 1]
    # ONE shared loop: pass count tracks rounds, not rank count
    assert stats["agg_passes"] == stats["rounds"] + 1
    assert stats["agg_passes"] < len(ks)
    # duplicate ranks collapse, all-equal degenerate domain converges
    dup = exact_kth_values(df, "v", [5, 5, 5], bins=64)
    assert dup == {5: sv[4]}
    allsame = spark.createDataFrame([(7,)] * 9, "v: long")
    assert exact_kth_values(allsame, "v", [1, 5, 9]) == {1: 7, 5: 7, 9: 7}
    with pytest.raises(ValueError):
        exact_kth_values(df, "v", [1, 0], bins=64)
    assert exact_kth_values(df, "v", []) == {}
    df.unpersist()


def test_exact_kth_values_weighted_batch(spark):
    """Weighted batched selection equals the weight-expanded multiset
    at every requested cumulative-weight rank."""
    from swisscourtrulingcorpus_spark.operators.relational import (
        exact_kth_values,
    )

    rng = random.Random(29)
    rows = [(rng.randrange(-500, 500), rng.randrange(1, 7)) for _ in range(800)]
    df = spark.createDataFrame(rows, "v: long, w: long")
    expanded = sorted(v for v, w in rows for _ in range(w))
    W = len(expanded)
    ks = [1, W // 4, (W + 1) // 2, 3 * W // 4, W]
    got = exact_kth_values(df, "v", ks, bins=64, weight_col="w")
    for k in ks:
        assert got[k] == expanded[k - 1]


def test_leadlag_xcorr_key_cardinality_guard(spark):
    """A key column above the max_keys bound raises loudly (naming the
    bound) instead of silently requesting a |keys|² result; raising
    the bound explicitly admits the same input."""
    import pytest

    from swisscourtrulingcorpus_spark.operators.relational import (
        leadlag_xcorr,
    )

    rows = [(f"k{i}", t, i + t) for i in range(80) for t in range(3)]
    df = spark.createDataFrame(rows, "k: string, t: long, v: long")
    with pytest.raises(ValueError, match="max_keys=64"):
        leadlag_xcorr(df, "k", "t", "v", max_lag=1)
    out = leadlag_xcorr(df, "k", "t", "v", max_lag=1, max_keys=100)
    assert out.where("key_a = 'k0' and key_b = 'k0' and lag = 0").count() == 1


def test_cms_join_size_disjoint_depth_gives_zero(spark):
    """A depth whose two sketches share NO buckets has true inner
    product 0 — the tightest bound — and must drive the min to 0
    instead of dropping out of the join."""
    from swisscourtrulingcorpus_spark.operators.sketches import (
        cms_join_size,
    )

    # hand-built sketches: depth 0 collides (ip 12), depth 1 disjoint
    a = spark.createDataFrame(
        [(0, 3, 4), (1, 7, 4)], "d: int, bucket: long, cnt: long"
    )
    b = spark.createDataFrame(
        [(0, 3, 3), (1, 9, 3)], "d: int, bucket: long, cnt: long"
    )
    est = cms_join_size(a, b).collect()[0].est_join_size
    assert est == 0


def test_variance_clamp_keeps_null_r(spark):
    """Zero-variance series still emit NULL r after the clamp (the
    clamp only guards the rounding-negative double case)."""
    from swisscourtrulingcorpus_spark.operators.relational import (
        leadlag_xcorr,
        pearson_matrix,
    )

    df = spark.createDataFrame(
        [("a", t, 5) for t in range(4)] + [("b", t, t) for t in range(4)],
        "k: string, t: long, v: long",
    )
    out = {
        (r.key_a, r.key_b, r.lag): r.r
        for r in leadlag_xcorr(df, "k", "t", "v", max_lag=0).collect()
    }
    assert out[("a", "a", 0)] is None  # constant series: zero variance
    assert abs(out[("b", "b", 0)] - 1.0) < 1e-12
    pm = pearson_matrix(
        spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "x: long, y: long"),
        ["x", "y"],
    ).collect()[0]
    assert pm.r is None


def test_cusum_batch_replay_matches_reference(spark):
    """The batch replay of the streaming CUSUM fold must equal a pure
    python day-boundary recurrence over completed days, and be
    invariant to how many micro-batch chunks the replay splits into
    (cross-batch state carry is exact)."""
    from swisscourtrulingcorpus_spark.streaming.stateful import (
        cusum_drift_batch_replay,
    )

    rng = random.Random(31)
    rows = []
    for t, base in (("click", 3), ("buy", 1)):
        for d in range(12):
            n = base + (8 if t == "click" and d >= 8 else 0)
            n += rng.randrange(0, 2)
            rows += [(t, f"2024-01-{d + 1:02d}")] * n
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "event_type: string, day: string")

    # python reference: fold completed days (last day pending)
    from collections import Counter

    def reference(t, ref, h):
        daily = Counter(d for ty, d in rows if ty == t)
        days = sorted(daily)[:-1]
        s = mx = nal = 0
        first = None
        for d in days:
            s = max(0, s + daily[d] - ref)
            mx = max(mx, s)
            if s > h:
                nal += 1
                first = first or d
        return (len(days), s, mx, nal, first)

    daily_all = Counter((t, d) for t, d in rows)
    per_type = Counter(t for t, _ in rows)
    refs = {}
    for t in ("click", "buy"):
        n_days = len({d for (ty, d) in daily_all if ty == t})
        refs[t] = per_type[t] // n_days
    hs = {t: 4 * r for t, r in refs.items()}

    for nb in (1, 3, 5):
        got = {
            r.event_type: (
                r.days_folded, r.s, r.max_cusum, r.n_alarm_days,
                r.first_alarm_day,
            )
            for r in cusum_drift_batch_replay(df, refs, hs, nb).collect()
        }
        for t in ("click", "buy"):
            assert got[t] == reference(t, refs[t], hs[t]), (t, nb)


def test_ks_two_sample_matches_reference(spark):
    """KS D must equal the exact python ECDF-difference max as an
    integer ratio, for overlapping and disjoint samples."""
    from swisscourtrulingcorpus_spark.operators.drift import ks_two_sample

    rng = random.Random(37)
    rows = [(rng.randrange(0, 300), "a") for _ in range(500)] + [
        (rng.randrange(50, 400), "b") for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "v: long, g: string")
    got = ks_two_sample(df, "v", "g", "a", "b").collect()[0]

    av = sorted(v for v, g in rows if g == "a")
    bv = sorted(v for v, g in rows if g == "b")
    na, nb = len(av), len(bv)
    pooled = sorted(set(av + bv))
    import bisect

    d_num = max(
        abs(nb * bisect.bisect_right(av, v) - na * bisect.bisect_right(bv, v))
        for v in pooled
    )
    assert (got.n_a, got.n_b, got.d_num, got.d_den) == (na, nb, d_num, na * nb)
    assert abs(got.d - d_num / (na * nb)) < 1e-15
    # disjoint supports => D == 1 exactly
    dd = spark.createDataFrame(
        [(1, "a")] * 5 + [(9, "b")] * 7, "v: long, g: string"
    )
    one = ks_two_sample(dd, "v", "g", "a", "b").collect()[0]
    assert one.d_num == one.d_den and one.d == 1.0
    import pytest

    with pytest.raises(ValueError):
        ks_two_sample(dd.where("g = 'a'"), "v", "g", "a", "b")


def test_psi_and_js_match_reference(spark):
    """PSI per-bin and JS per-token contributions must equal the
    python formulas (micro-int rounded); JS contributions are
    non-negative by Jensen."""
    import math

    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.drift import (
        js_token_divergence,
        psi_table,
    )

    rng = random.Random(41)
    rows = [(rng.randrange(0, 8), rng.random() < 0.5) for _ in range(2000)]
    df = spark.createDataFrame(rows, "b: long, a: boolean")
    got = {
        r.bin: r for r in psi_table(df, F.col("b"), F.col("a")).collect()
    }
    from collections import Counter

    ca = Counter(b for b, a in rows if a)
    cb = Counter(b for b, a in rows if not a)
    na, nb = sum(ca.values()), sum(cb.values())
    for b in set(ca) | set(cb):
        r = got[b]
        assert (r.cnt_a, r.cnt_b) == (ca[b], cb[b])
        if ca[b] and cb[b]:
            pa, pb = ca[b] / na, cb[b] / nb
            want = round((pa - pb) * math.log(pa / pb) * 1e6)
            assert r.psi_contrib_micro == want
        else:
            assert r.psi_contrib_micro is None

    tok_rows = [
        (rng.choice(["x", "y", "z", "w"]), rng.random() < 0.5)
        for _ in range(3000)
    ] + [("onlya", True)] * 60
    tdf = spark.createDataFrame(tok_rows, "t: string, a: boolean")
    jgot = {
        r.token: r
        for r in js_token_divergence(
            tdf, F.col("t"), F.col("a"), min_total=20
        ).collect()
    }
    ja = Counter(t for t, a in tok_rows if a)
    jb = Counter(t for t, a in tok_rows if not a)
    jna, jnb = sum(ja.values()), sum(jb.values())
    for t in set(ja) | set(jb):
        if ja[t] + jb[t] < 20:
            assert t not in jgot
            continue
        pa, pb = ja[t] / jna, jb[t] / jnb
        m = (pa + pb) / 2
        want = round(
            0.5
            * (
                (pa * math.log(pa / m) if ja[t] else 0.0)
                + (pb * math.log(pb / m) if jb[t] else 0.0)
            )
            * 1e6
        )
        r = jgot[t]
        assert (r.cnt_a, r.cnt_b, r.js_contrib_micro) == (ja[t], jb[t], want)
        assert r.js_contrib_micro >= 0
