"""Training-prep operator properties: priority sampling (weight-
proportional selection + unbiased-total estimator, Duffield et al.
2007).  The value-exact side is driver-gated (priority_sample_* in
plans/training_queries.py); these assert the STATISTICAL contract the
gate can't."""

from __future__ import annotations


def test_priority_sample_estimator_tracks_true_total(spark):
    """Priority sampling's whole point: sum(max(w_i, tau)) over the
    sample estimates the TRUE total weight (Duffield et al. 2007,
    variance ~ totals/sqrt(k-1)).  Deterministic on the fixed corpus;
    bound generous enough to catch arithmetic bugs only."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.functions.text import token_count_ws
    from swisscourtrulingcorpus_spark.plans.training_queries import (
        q_priority_sample_estimate,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    sf01 = "/root/testdata/sf0.01"
    true_total = (
        load_table(spark, sf01, "documents")
        .select(F.sum(token_count_ws("text")).alias("t"))
        .collect()[0]["t"]
    )
    est = q_priority_sample_estimate(spark, sf01).collect()[0]
    assert est.k_used == 64
    assert abs(est.est_total_tokens - true_total) <= 0.30 * true_total, (
        true_total,
        est.est_total_tokens,
    )


def test_priority_sample_weight_zero_excluded_and_deterministic(spark):
    """w <= 0 rows can never appear, and two runs produce identical
    samples (md5-keyed, engine-independent)."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import priority_sample

    df = spark.createDataFrame(
        [(i, 0 if i % 7 == 0 else i % 50 + 1) for i in range(300)],
        "id: long, w: long",
    )
    a = priority_sample(df, F.col("w"), "id", k=20).collect()
    b = priority_sample(df, F.col("w"), "id", k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 21 and sum(r.is_sample for r in a) == 20
    sampled_ids = {r.id for r in a if r.is_sample}
    assert all(i % 7 != 0 for i in sampled_ids)


def test_priority_sample_staged_division_no_int64_wrap(spark):
    """ADVICE r06: the naive w * 2^32 numerator wrapped silently (ANSI
    off) past w >= 2^31 even when the quotient itself fit int64.  The
    staged long-division form must (a) match floor(w * 2^32 / (h+1))
    computed in unbounded Python ints for every row, and (b) stay
    positive/exact at weights far beyond 2^31."""
    import hashlib

    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import priority_sample

    weights = [1, 7, 2**31 - 1, 2**31, 2**32, 2**40 + 12345, 2**45]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id: long, w: long"
    )
    rows = priority_sample(df, F.col("w"), "id", k=len(weights)).collect()
    got = {r.id: r.q_scaled for r in rows}
    for i, w in enumerate(weights):
        h = int(hashlib.md5(f"psamp|{i}".encode()).hexdigest()[:8], 16)
        expect = (w << 32) // (h + 1)  # unbounded Python ints
        assert got[i] == expect, (i, w, got[i], expect)
        assert got[i] > 0


def test_priority_sample_overflowing_quotient_raises_loudly(spark):
    """ADVICE r07: when the true quotient q = w*2^32 div (h+1) itself
    exceeds int64 (w div (h+1) >= 2^31 — a huge weight meeting a tiny
    hash), the staged form's first product would wrap SILENTLY under
    non-ANSI Spark while the DuckDB oracle errors.  The operator must
    raise on both engines instead of diverging."""
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.operators.training import priority_sample

    # pick the id whose hash is smallest among a small probe set, then
    # construct a weight guaranteed to overflow: w = (h+1) * 2^31
    probe = {
        i: int(hashlib.md5(f"psamp|{i}".encode()).hexdigest()[:8], 16)
        for i in range(32)
    }
    i_min, h_min = min(probe.items(), key=lambda t: t[1])
    w_bad = (h_min + 1) * (2**31)
    assert w_bad < 2**63  # representable input, unrepresentable quotient
    df = spark.createDataFrame([(i_min, w_bad)], "id: long, w: long")
    with pytest.raises(Exception, match="priority_sample.*exceeds int64"):
        priority_sample(df, F.col("w"), "id", k=1).collect()

