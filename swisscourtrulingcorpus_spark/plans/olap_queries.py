"""OLAP breadth pack: the remaining classic TPC-H query shapes the
star-schema fixtures can express, plus ranking-window and CUBE
coverage.

Why these exist: SURVEY §2.3/§2.4 note the reference never needs more
than equi+left joins and flat aggregates — but the *engine* a user
switches to must still run the standard OLAP shapes over the same
tables (BASELINE north star: full query capability at 100 TB).  Each
query documents its physical plan intent; all money math follows the
repo-wide DECIMAL(18,2)-then-DOUBLE convention (`functions/money.py`).

Scale notes common to the pack:
- lineitem ⋈ orders is the one fact-fact meet — shuffles on orderkey
  (SMJ under AQE, shuffle-free on the bucketed path in
  `sources/bucketing.py`).
- nation/region always broadcast; customer/supplier/part are left to
  AQE's runtime size decision (broadcast at test scale, shuffle at
  100 TB — both correct).
- Every filter sits directly on a scan so it reaches the parquet
  reader as a PushedFilter (verified pattern in test_plan_quality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.functions.money import dec2, disc_price
from swisscourtrulingcorpus_spark.plans.registry import QuerySpec
from swisscourtrulingcorpus_spark.sources.catalog import load_table

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# --- Q6 shape: pure scan-side filter + single aggregate -----------------

def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pushdown benchmark.  Every predicate lands in the
    parquet scan (date range, discount band, quantity cap); the plan is
    scan → partial sum → single-row exchange → final sum.  At 100 TB
    this is the query where column pruning + predicate pushdown ARE the
    performance model: 3 columns read out of 11, row groups skipped on
    the shipdate min/max stats."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (dec2("l_discount") >= F.lit("0.03").cast("decimal(18,2)"))
        & (dec2("l_discount") <= F.lit("0.07").cast("decimal(18,2)"))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec2("l_extendedprice") * dec2("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_ORACLE = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST('0.03' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
  AND l_quantity < 24
"""


# --- Q7 shape: bidirectional two-nation trade volume --------------------

def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation ↔ customer-nation trade: the nation dim joins the
    fact chain TWICE under different roles (supplier side / customer
    side) — both broadcast, so the only shuffle is the lineitem⋈orders
    meet.  The (n1,n2)∈{(1,2),(2,1)} disjunction is applied AFTER the
    dim joins resolve names, exactly where Catalyst can still push it
    into the broadcast-join output before the aggregate."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("trade_year"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


Q7_ORACLE = f"""
SELECT
  ns.n_name AS supp_nation,
  nc.n_name AS cust_nation,
  year(l_shipdate) AS trade_year,
  CAST(sum({_DEC_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
GROUP BY ns.n_name, nc.n_name, year(l_shipdate)
"""


# --- Q10 shape: returned-item revenue, top-20 customers -----------------

def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ranked by revenue lost to returns in one quarter-ish
    window: filtered fact-fact join, revenue agg per customer, dim
    attach AFTER the aggregate (one row per customer joins nation —
    not every lineitem row), deterministic top-20."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({_DEC_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q12 shape: cross-fact date predicate + conditional counts ----------

def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines shipped > 60 days after their order's date (a predicate
    relating columns of BOTH fact tables — evaluable only post-join),
    counted per returnflag split into high/low order priority.  The
    join moves only (orderkey, date, priority) — Catalyst prunes both
    sides to the referenced columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


# --- Q17 shape: per-key average, join back, threshold filter ------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from 'small' lineitems: quantity below 20% of the part's
    average quantity.  The correlated `avg` decorrelates to a per-part
    aggregate joined back on partkey (same argmin-join-back family as
    q2/q18).  The threshold compare is EXACT integer/decimal algebra —
    `qty * 5 * cnt < sum_qty` instead of `qty < 0.2 * avg` — so no
    engine-specific double rounding can flip a boundary row.  Brand
    filter restricts the probe side before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(dec2("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .where(dec2("l_quantity") * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS agg_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey)
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
  count(*) AS n_small_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = agg_partkey
WHERE p_brand = 'Brand#1'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
"""


# --- Q19 shape: OR-of-ANDs join predicate -------------------------------

def q19_brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity bands over lineitem ⋈ part.
    Catalyst extracts the common `l_partkey = p_partkey` conjunct as
    the join key and keeps the OR as a post-join filter; per-branch
    part predicates can't prune the scan (the OR spans both sides) but
    the small part dim broadcasts, so the disjunction evaluates
    map-side with zero extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    )
    band2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    band3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(band1 | band2 | band3)
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_ORACLE = f"""
SELECT
  CAST(sum({_DEC_REV}) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Ranking-window breadth: ntile / percent_rank / cume_dist -----------

def ntile_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles via the full ranking-window family the
    engine exposes beyond rank/row_number (already gated in
    `topk_orders_per_segment`): ntile(4), percent_rank, cume_dist over
    one window.  Spend is the exact decimal per-customer order total,
    ordering is (spend, custkey) — fully deterministic, so the window
    outputs are engine-identical doubles (pure integer-rank
    arithmetic).  One shuffle for the groupBy, one for the window
    sort; at 100 TB the single global window would become per-segment
    windows (partitionBy) — kept global here because quartiles are
    corpus-wide by definition."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec2("o_totalprice")).alias("spend_dec")
    )
    w = Window.orderBy(F.asc("spend_dec"), F.asc("o_custkey"))
    return (
        spend.join(cust, spend.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            F.col("spend_dec").cast("double").alias("total_spend"),
            F.ntile(4).over(w).alias("spend_quartile"),
            F.percent_rank().over(w).alias("spend_pct_rank"),
            F.cume_dist().over(w).alias("spend_cume_dist"),
        )
    )


NTILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders GROUP BY o_custkey)
SELECT
  c_custkey,
  CAST(spend_dec AS DOUBLE) AS total_spend,
  ntile(4) OVER w AS spend_quartile,
  percent_rank() OVER w AS spend_pct_rank,
  cume_dist() OVER w AS spend_cume_dist
FROM spend JOIN customer ON o_custkey = c_custkey
WINDOW w AS (ORDER BY spend_dec ASC, o_custkey ASC)
"""


# --- CUBE: full grouping lattice over order dimensions ------------------

def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all four grouping sets in one pass
    (SURVEY §2.4 notes rollup is the reference's natural ladder — cube
    is the engine capability superset).  Spark computes the lattice by
    expanding each input row once per grouping set BEFORE the shuffle,
    with partial aggregation per set — same strategy DuckDB uses, and
    the exact decimal sum makes every lattice cell engine-identical.
    Null group keys are labeled '<ALL>' (the fixtures contain no real
    nulls), keeping the driver's column-name hash simple."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec2("o_totalprice")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<ALL>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<ALL>")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


CUBE_ORACLE = """
SELECT
  coalesce(o_orderstatus, '<ALL>') AS status,
  coalesce(o_orderpriority, '<ALL>') AS priority,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- GROUPING SETS: arbitrary (non-lattice) set list ---------------------

def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status), (priority), ()) — the two marginal
    breakdowns plus the grand total WITHOUT the (status, priority)
    cross cells a CUBE would add.  Completes the A4 grouping family
    (rollup ⊂ grouping-sets ⊃ cube) with the arbitrary-set form; one
    Expand + one shuffle exactly like cube, just three set rows per
    input row instead of four.  Emits explicit grouping() flags so
    '<ALL>' labels stay unambiguous even if a real '<ALL>' value ever
    entered the dimension domain."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec2("o_totalprice")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<ALL>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<ALL>")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_value",
        )
    )


GROUPING_SETS_ORACLE = """
SELECT
  coalesce(o_orderstatus, '<ALL>') AS status,
  coalesce(o_orderpriority, '<ALL>') AS priority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- Q13 shape: outer-join count-of-counts ------------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer INCLUDING zero-order
    customers — the LEFT OUTER fact join shape: customer ⟕ orders,
    `count(o_orderkey)` (nulls don't count → 0 for customers with no
    orders), then a second aggregation over the counts.  Both
    aggregations partial-aggregate map-side; the first shuffles on
    custkey, the second on the (tiny) count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


Q13_ORACLE = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey)
GROUP BY n_orders
"""


# --- Q22 shape: scalar-average subquery + anti-join ---------------------

def q22_dormant_valuable_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average account balance and no RECENT
    orders (none since 2000-01-01 — every sf0.01 customer has some
    order, so plain NOT-EXISTS returns zero rows and would make the
    gate trivially green): the scalar subquery (global avg over
    positive balances) evaluates to ONE row — crossed in as a
    broadcast, never recomputed per row — and the `NOT EXISTS` is a
    left_anti join against the date-filtered orders.  Grouped by
    market segment (stand-in for Q22's country code prefix)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec2("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


Q22_ORACLE = """
WITH avg_bal AS (
  -- VARCHAR round-trip: DuckDB's direct DECIMAL->DOUBLE cast
  -- double-rounds (int128->double, then /10^scale) and can land 1 ulp
  -- off Spark's BigDecimal conversion, flipping the > comparison for
  -- a balance within 1 ulp of the average.
  SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# --- RANGE window frame: interval-based rolling aggregate ---------------

def rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: the customer's total spend over the trailing 30 days
    — a RANGE frame (value-based, ties-inclusive), the one window-frame
    type the other window queries don't exercise (ROWS frames: session
    assembly; unbounded: rankings).  Event time converts to integer
    epoch SECONDS on both engines so the frame bound is exact integer
    arithmetic; the sum is exact decimal.  RANGE frames are inherently
    order-deterministic (all ties included), so no tiebreak is needed.
    One shuffle on o_custkey; the frame is evaluated in one sorted pass
    per partition."""
    from swisscourtrulingcorpus_spark.sources.catalog import epoch_us

    orders = load_table(spark, sf_dir, "orders")
    with_s = orders.withColumn("od_s", epoch_us("o_orderdate") / F.lit(1_000_000))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return with_s.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


ROLLING_ORACLE = """
SELECT o_orderkey,
       o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY epoch_us(o_orderdate) // 1000000
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
FROM orders
"""


# --- dispersion statistics from exact partials --------------------------

def dispersion_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status mean/variance/stddev of order value — the engine's
    statistical-aggregate surface (A11 `describe()` family), computed
    from EXACT decimal partials (sum, sum of squares, count) with the
    double math applied once, in the same order, on both engines.
    ``stddev_samp`` built-ins use engine-specific streaming algorithms
    whose float accumulation differs run-to-run and engine-to-engine;
    sum/sumsq partials are exact, associative, partition-order-free —
    the only formulation that is BOTH parallel-safe and bit-stable."""
    orders = load_table(spark, sf_dir, "orders")
    v = dec2("o_totalprice")
    agg = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__sq"),
    )
    s = F.col("__s").cast("double")
    sq = F.col("__sq").cast("double")
    n = F.col("n")
    var = (sq - s * s / n) / (n - F.lit(1))
    return agg.select(
        "o_orderstatus",
        "n",
        (s / n).alias("mean_value"),
        var.alias("var_value"),
        F.sqrt(var).alias("stddev_value"),
    )


# NB the VARCHAR round-trip on the sum-of-squares cast: DuckDB's direct
# DECIMAL→DOUBLE cast double-rounds (int128→double, then ÷10^scale) and
# can land one ulp off at ~16 significant digits; string→double parsing
# is correctly rounded, matching Spark's BigDecimal conversion exactly.
DISPERSION_ORACLE = """
WITH agg AS (
  SELECT o_orderstatus,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s_dec,
         sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS sq_dec
  FROM orders GROUP BY o_orderstatus),
d AS (
  SELECT o_orderstatus, n,
         CAST(CAST(s_dec AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sq_dec AS VARCHAR) AS DOUBLE) AS sq
  FROM agg)
SELECT o_orderstatus,
       n,
       s / n AS mean_value,
       (sq - s * s / n) / (n - 1) AS var_value,
       sqrt((sq - s * s / n) / (n - 1)) AS stddev_value
FROM d
"""


# --- robust outliers: median + MAD, integer-exact ------------------------

def mad_outliers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust outlier report: median order value, median
    absolute deviation, and how many orders sit beyond median ± 3·MAD —
    the robust (quartile-free) cousin of `dispersion_order_value`.

    Cross-engine medians are kept integer-exact with the 2x trick:
    med2 = the SUM of the two middle cents values (positions
    floor((n+1)/2) and ceil((n+1)/2) of the sorted group; an odd group
    counts its middle row twice), so no engine ever interpolates a
    double.  Deviations then live in 2x units (dev2 = |2·cents−med2|)
    and their median in 4x units (mad4), making the 3-MAD rule the
    pure-integer predicate 2·dev2 > 3·mad4.

    Plan shape: two rank windows over the same (priority) partitioning
    — one exchange, reused — plus two broadcast joins of 5-row medians
    back to the rows.  Row_number needs a total order, so ties break by
    o_orderkey; the values at the middle POSITIONS are tie-invariant."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        (dec2("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    grp = Window.partitionBy("o_orderpriority")

    def med2_of(df, val_col, out_name):
        w = grp.orderBy(F.col(val_col), F.col("o_orderkey"))
        ranked = df.select(
            "o_orderpriority",
            val_col,
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(grp).alias("n"),
        )
        pick = (
            (F.col("rn") == F.expr("(n + 1) div 2")).cast("int")
            + (F.col("rn") == F.expr("(n + 2) div 2")).cast("int")
        )
        return ranked.groupBy("o_orderpriority").agg(
            F.max("n").alias(out_name.replace("med2", "n")),
            F.sum(F.col(val_col) * pick).alias(out_name),
        )

    med = med2_of(o, "cents", "med2_cents").drop("n_cents")
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        F.abs(F.lit(2) * F.col("cents") - F.col("med2_cents")).alias("dev2"),
    )
    mad = med2_of(dev, "dev2", "med2_dev2").withColumnRenamed(
        "med2_dev2", "mad4_cents"
    ).withColumnRenamed("n_dev2", "n")
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .join(F.broadcast(med), "o_orderpriority")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.max("n").alias("n_orders"),
            F.max("med2_cents").alias("med2_cents"),
            F.max("mad4_cents").alias("mad4_cents"),
            F.sum(
                (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4_cents"))
                .cast("bigint")
            ).alias("n_outliers"),
        )
    )


MAD_OUTLIERS_ORACLE = """
WITH o AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders),
r1 AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM o),
med AS (
  SELECT o_orderpriority,
         sum(cents * (CAST(rn = (n + 1) // 2 AS INTEGER)
                      + CAST(rn = (n + 2) // 2 AS INTEGER))) AS med2_cents
  FROM r1 GROUP BY o_orderpriority),
dev AS (
  SELECT o.o_orderpriority, o.o_orderkey,
         abs(2 * o.cents - m.med2_cents) AS dev2
  FROM o JOIN med m USING (o_orderpriority)),
r2 AS (
  SELECT o_orderpriority, dev2,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY dev2, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM dev),
mad AS (
  SELECT o_orderpriority, max(n) AS n,
         sum(dev2 * (CAST(rn = (n + 1) // 2 AS INTEGER)
                     + CAST(rn = (n + 2) // 2 AS INTEGER))) AS mad4_cents
  FROM r2 GROUP BY o_orderpriority)
SELECT d.o_orderpriority AS priority,
       CAST(max(a.n) AS BIGINT) AS n_orders,
       CAST(max(m.med2_cents) AS BIGINT) AS med2_cents,
       CAST(max(a.mad4_cents) AS BIGINT) AS mad4_cents,
       CAST(sum(CAST(2 * d.dev2 > 3 * a.mad4_cents AS INTEGER)) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad a USING (o_orderpriority) JOIN med m USING (o_orderpriority)
GROUP BY 1
"""


SPECS = [
    QuerySpec("dispersion_order_value", dispersion_order_value, DISPERSION_ORACLE, "exact-partial variance/stddev"),
    QuerySpec("rolling_30d_spend", rolling_30d_spend, ROLLING_ORACLE, "RANGE window frame"),
    QuerySpec("q13_order_count_distribution", q13_order_count_distribution, Q13_ORACLE, "Q13 outer-join count-of-counts"),
    QuerySpec("q22_dormant_valuable_customers", q22_dormant_valuable_customers, Q22_ORACLE, "Q22 scalar-avg + anti-join"),
    QuerySpec("q6_revenue_delta", q6_revenue_delta, Q6_ORACLE, "Q6 pushdown scan-agg"),
    QuerySpec("q7_nation_trade_volume", q7_nation_trade_volume, Q7_ORACLE, "Q7 dual-role dim join"),
    QuerySpec("q10_returned_revenue_topk", q10_returned_revenue_topk, Q10_ORACLE, "Q10 agg-then-dim top-k"),
    QuerySpec("q12_late_shipment_priority", q12_late_shipment_priority, Q12_ORACLE, "Q12 cross-fact predicate"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE, "Q17 avg join-back"),
    QuerySpec("q19_brand_size_revenue", q19_brand_size_revenue, Q19_ORACLE, "Q19 OR-of-ANDs"),
    QuerySpec("ntile_customer_spend", ntile_customer_spend, NTILE_ORACLE, "ntile/percent_rank/cume_dist"),
    QuerySpec("cube_order_status_priority", cube_order_status_priority, CUBE_ORACLE, "CUBE lattice"),
    QuerySpec("grouping_sets_order_stats", grouping_sets_order_stats, GROUPING_SETS_ORACLE, "arbitrary GROUPING SETS + grouping() flags"),
    QuerySpec("mad_outliers_orders", mad_outliers_orders, MAD_OUTLIERS_ORACLE, "median/MAD robust outliers, integer-exact 2x-median"),
]
