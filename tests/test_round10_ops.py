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
