"""Oracle-gated PORTABLE sketches — integer-exact HyperLogLog.

`operators/sketches.py` wraps Spark's built-in HLL++/KLL sketches, which
can never hash-match a DuckDB oracle (different algorithms and seeds by
design) and are therefore covered by accuracy-bound tests only.  This
module closes that gap with a from-scratch HyperLogLog whose every step
is engine-independent INTEGER arithmetic on the shared md5 hash
(`functions/hashing.py::h32`), so the register table AND the cardinality
estimate are value-identical between Spark and DuckDB — the sketch
family's first full-strength driver gates.

Construction (p = 6, m = 64 registers, classic Flajolet et al. 2007):

- ``h``       32-bit md5-derived hash of the key (`h32`, seed "hll")
- ``register`` = top 6 bits  = ``h DIV 2^26``
- ``tail``     = low 26 bits = ``h % 2^26``
- ``rank``     = leading zeros of the 26-bit tail + 1
               = 27 when tail = 0, else ``27 - length(bin(tail))``
  (binary-digit count replaces floor(log2): both engines render exact
  binary strings — Spark ``conv(tail,10,2)``, DuckDB ``bin(tail)`` — so
  no float log enters the pipeline)
- per-register state = ``max(rank)`` — the mergeable HLL invariant: the
  map-side partial agg IS the sketch merge, so the shuffle carries at
  most m rows per partition regardless of input size.

The estimate stays integer too: with ``S = Σ_j 2^(27 - M[j])``
(empty registers contribute 2^27), the raw HLL estimate
``alpha_m * m^2 / Σ 2^(-M[j])`` equals ``alpha_m * m^2 * 2^27 / S``, so
``est_milli = (709 * 64 * 64 * 2^27) DIV (1000 * S) * 1000 ...`` — we
emit ``floor(1000 * estimate)`` via one bigint division (numerator
709*4096*2^27 ≈ 3.9e14 < 2^63).  alpha_64 = 0.709 per the paper.

At 100 TB this is THE counting pattern: the register table is a
64-row mergeable summary per group — distinct-user counts over any
union of day/court partitions come from max-merging stored registers,
never re-scanning raw data (the reference recomputes its counters from
scratch each run, `abstract_preprocessor.py:316-326`).

No small/large-range correction: the gate pins the raw estimator (the
correction branch is a driver-side if over the same S, exercised in
tests/test_sketches.py against the exact count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.functions.hashing import h32
from swisscourtrulingcorpus_spark.plans.registry import QuerySpec
from swisscourtrulingcorpus_spark.sources.catalog import load_table

_P = 6
_M = 1 << _P  # 64 registers
_TAIL_BITS = 32 - _P  # 26
_TAIL_MOD = 1 << _TAIL_BITS
_RANK_EMPTY_TERM = 1 << (_TAIL_BITS + 1)  # 2^27, the 2^(27-0) term
# alpha in thousandths (alpha_64 = 0.709), so _EST_NUM / S is already
# 1000 * estimate — one bigint division, no float alpha anywhere.
_EST_NUM = 709 * _M * _M * (1 << (_TAIL_BITS + 1))  # 709 * 4096 * 2^27


def _registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    h = h32("k", seed="hll")
    tail = h % F.lit(_TAIL_MOD)
    rank = F.when(tail == 0, F.lit(_TAIL_BITS + 1)).otherwise(
        F.lit(_TAIL_BITS + 1) - F.length(F.conv(tail.cast("string"), 10, 2))
    )
    return (
        ev.select(
            F.shiftright(h, _TAIL_BITS).alias("register"),
            rank.alias("rank"),
        )
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_register_table_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materializable sketch itself: (register, max_rank) rows for
    distinct events.user_id — at most 64 rows whatever the input size."""
    return _registers(spark, sf_dir)


def hll_estimate_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row integer-exact HLL cardinality estimate over the register
    table: m, observed register count, the exact dyadic sum S scaled to
    an integer, and floor(1000 * alpha*m^2/Σ2^-M)."""
    regs = _registers(spark, sf_dir)
    return regs.agg(
        F.lit(_M).alias("m"),
        F.count(F.lit(1)).alias("registers_used"),
        (
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_TAIL_BITS + 1} - max_rank)"
                )
            )
            + (F.lit(_M) - F.count(F.lit(1))) * F.lit(_RANK_EMPTY_TERM)
        ).alias("s_dyadic"),
    ).select(
        "m",
        "registers_used",
        "s_dyadic",
        F.expr(f"{_EST_NUM} div s_dyadic").alias("est_milli"),
    )


_HLL_REGS_CTE = f"""
WITH h AS (
  SELECT ('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT AS h
  FROM events),
r AS (
  SELECT CAST(h // {_TAIL_MOD} AS BIGINT) AS register,
         h % {_TAIL_MOD} AS tail
  FROM h),
ranked AS (
  SELECT register,
         CASE WHEN tail = 0 THEN {_TAIL_BITS + 1}
              ELSE {_TAIL_BITS + 1} - length(bin(tail)) END AS rank
  FROM r),
regs AS (
  SELECT register, CAST(max(rank) AS BIGINT) AS max_rank
  FROM ranked GROUP BY register)
"""

HLL_REGISTER_ORACLE = (
    _HLL_REGS_CTE
    + """
SELECT register, max_rank FROM regs
"""
)

HLL_ESTIMATE_ORACLE = (
    _HLL_REGS_CTE
    + f"""
SELECT CAST({_M} AS INTEGER) AS m,
       CAST(count(*) AS BIGINT) AS registers_used,
       CAST(sum(1::BIGINT << ({_TAIL_BITS + 1} - max_rank))
            + ({_M} - count(*)) * {_RANK_EMPTY_TERM} AS BIGINT) AS s_dyadic,
       CAST({_EST_NUM} // (sum(1::BIGINT << ({_TAIL_BITS + 1} - max_rank))
            + ({_M} - count(*)) * {_RANK_EMPTY_TERM}) AS BIGINT) AS est_milli
FROM regs
"""
)


SPECS = [
    QuerySpec(
        "hll_register_table_users",
        hll_register_table_users,
        HLL_REGISTER_ORACLE,
        "portable integer-exact HyperLogLog register table (p=6) over events.user_id",
    ),
    QuerySpec(
        "hll_estimate_users",
        hll_estimate_users,
        HLL_ESTIMATE_ORACLE,
        "integer-exact HLL cardinality estimate (dyadic sum + bigint division)",
    ),
]
