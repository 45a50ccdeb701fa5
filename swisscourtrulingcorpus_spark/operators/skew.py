"""Skew-handling operators (SURVEY.md §4: the CH_BGer problem).

AQE's skew-join split covers joins; what it does NOT cover is a
skewed ``groupBy(...).agg(collect_list(...))``-style aggregation where
one key holds a large share of all rows (40%+ of the reference corpus
sits in one court) — that key's entire payload lands on one reducer.

``salted_collect_agg`` is the classic two-phase fix: aggregate on
(key, salt) first so the hot key's rows spread over N reducers, then
merge the N partial results per key.  Works for any agg with an
associative merge; exposed here for the collect_list/concat family the
map_join pattern uses (sums/counts don't need it — Spark's partial
aggregation already spreads those map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """Key-skew diagnostics ahead of a join/agg on ``key``: row and
    distinct-key counts, the heaviest key's share, and the max/avg
    ratio — the number that decides between a plain shuffle, AQE skew
    split, and the salted two-phase agg below.

    Two passes over the key column only (one groupBy + one aggregate
    of the per-key counts); emits (metric, value) rows so pipelines
    can threshold-alert on it like the data-quality report.  When the
    ratio says "skewed", :func:`key_skew_report` names the offending
    keys."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    row = counts.agg(
        F.sum("__n").alias("rows"),
        F.count(F.lit(1)).alias("keys"),
        F.max("__n").alias("max_key"),
        F.min("__n").alias("min_key"),
    ).select(
        "rows",
        "keys",
        "max_key",
        "min_key",
        (F.col("max_key") / (F.col("rows") / F.col("keys"))).alias("skew_ratio"),
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("metric"),
                F.col(name).cast("double").alias("value"),
            )
            for name in ["rows", "keys", "max_key", "min_key", "skew_ratio"]
        ]
    )
    return row.select(F.explode(entries).alias("__e")).select("__e.*")


def salted_collect_agg(
    df: DataFrame,
    key: str,
    value: Column,
    alias: str,
    num_salts: int = 8,
    sort_result: bool = True,
) -> DataFrame:
    """Two-phase collect_list: phase 1 groups on (key, salt) — the hot
    key's rows spread across ``num_salts`` reducers; phase 2 flattens
    the per-salt arrays per key.  The phase-2 input is one short row
    per (key, salt), so the second shuffle is tiny regardless of skew.

    With ``sort_result`` the final array is sorted, making the output
    deterministic and salt-invariant (equal to an unsalted
    ``sort_array(collect_list(...))``).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    phase1 = salted.groupBy(key, "__salt").agg(
        F.collect_list(value).alias("__partial")
    )
    merged = F.flatten(F.collect_list("__partial"))
    if sort_result:
        merged = F.sort_array(merged)
    return phase1.groupBy(key).agg(merged.alias(alias))


def collect_agg_auto(
    df: DataFrame,
    key: str,
    value: Column,
    alias: str,
    skew_threshold: float = 4.0,
    num_salts: int = 8,
) -> tuple[DataFrame, str]:
    """Measure-then-choose between the plain single-shuffle
    ``sort_array(collect_list(...))`` and `salted_collect_agg` — the
    agg-level analogue of AQE's runtime skew-join decision, which does
    not exist for aggregations.

    The probe is one aggregate over the SLIM key column (two shuffles
    of (key, count) pairs and a 1-row bounded collect) — at scale this
    costs a small fraction of the payload shuffle it protects, and a
    pipeline that already ran `skew_report` can pass its ratio straight
    to `salted_collect_agg` instead.  Returns ``(result, chosen)`` with
    chosen in {'plain', 'salted'}; both paths produce the identical
    sorted-array output (salt-invariance is `salted_collect_agg`'s
    contract), so the choice is pure performance.
    """
    stats = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("mx"), F.avg("__n").alias("avg"))
        .collect()[0]
    )
    if stats["mx"] is None or stats["mx"] < skew_threshold * stats["avg"]:
        plain = df.groupBy(key).agg(
            F.sort_array(F.collect_list(value)).alias(alias)
        )
        return plain, "plain"
    return (
        salted_collect_agg(df, key, value, alias, num_salts=num_salts),
        "salted",
    )


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """The WHICH-keys companion to :func:`skew_report`: that report
    answers "is this key skewed" with summary ratios; this one names
    the ``top_k`` heaviest values — exact row counts, micro-integer
    corpus share, distinct-key count — so the salting/AQE decision can
    target the actual offenders (a 2% key at 100 TB is a 2 TB
    straggler partition).

    Scale shape: one map-side-combined count per key, then
    TakeOrderedAndProject for the top k (orderBy+limit never
    materializes a global sort), a 1-row broadcast total, and a rank
    window over the ALREADY k-bounded result — the single-partition
    window is capped at ``top_k`` rows by construction.  Keys leave as
    strings so one report shape serves any key type.
    """
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n_rows",
            F.expr("n_rows * 1000000 div __total").alias("share_micro"),
            F.col("__distinct").alias("n_distinct_keys"),
        )
    )


def selfjoin_blowup_report(df: DataFrame, key_col: str) -> DataFrame:
    """Pre-flight cost check for an equi-self-join on ``key_col``: the
    EXACT output size it would produce (Σ n(k)² including self-pairs —
    the quantity a stop-shingle guard or hub cap exists to bound) next
    to the input size, distinct keys, and the single heaviest key's
    contribution — read this BEFORE running an ngram-Jaccard-style
    inverted-index join, the way :func:`key_skew_report` precedes a
    fact join.  One row.

    Scale shape: one map-side-combined count per key, then one 1-row
    aggregate over the per-key counts — nothing pair-sized is ever
    materialized; the report costs one groupBy regardless of how big
    the join it predicts would be."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.sum(F.col("n") * F.col("n")).alias("predicted_pairs"),
        F.max(F.col("n") * F.col("n")).alias("max_key_pairs"),
    )
