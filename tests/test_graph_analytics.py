"""Co-purchase / citation graph analytics (plans/behavior_queries.py,
plans/extraction_queries.py): the hub-cap guard and triangle-count
semantics the gates' oracles can't isolate on their own."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_copurchase_hub_cap_drops_hub_parts(spark, tmp_path):
    """A part bought by more than _COP_CAP distinct customers must
    contribute NO edges (the quadratic guard), while a below-cap part
    contributes exactly C(n,2)."""
    from swisscourtrulingcorpus_spark.plans import behavior_queries as bq

    cap = bq._COP_CAP
    # hub part 1: cap+5 customers; small part 2: 4 customers
    li = spark.createDataFrame(
        [(1, 100 + i) for i in range(cap + 5)] + [(2, 200 + i) for i in range(4)],
        "l_partkey: long, l_orderkey: long",
    )
    orders = spark.createDataFrame(
        [(100 + i, 1000 + i) for i in range(cap + 5)]
        + [(200 + i, 2000 + i) for i in range(4)],
        "o_orderkey: long, o_custkey: long",
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    orders.select(
        "o_orderkey", "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.current_timestamp().alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.parquet(f"{sf}/orders.parquet")

    edges = bq._copurchase_edges(spark, sf).collect()
    custs = {c for r in edges for c in (r.c1, r.c2)}
    assert all(2000 <= c < 2004 for c in custs), custs  # only the small part
    assert len(edges) == 6  # C(4,2)


def test_triangle_count_matches_closed_form(spark, tmp_path):
    """One part bought by 5 customers forms K5: C(5,3)=10 triangles,
    every customer degree 4."""
    from swisscourtrulingcorpus_spark.plans import behavior_queries as bq

    li = spark.createDataFrame(
        [(1, 100 + i) for i in range(5)], "l_partkey: long, l_orderkey: long"
    )
    orders = spark.createDataFrame(
        [(100 + i, 1000 + i) for i in range(5)],
        "o_orderkey: long, o_custkey: long",
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    orders.select(
        "o_orderkey", "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.current_timestamp().alias("o_orderdate"),
        F.lit("3-MEDIUM").alias("o_orderpriority"),
    ).write.parquet(f"{sf}/orders.parquet")

    assert bq.copurchase_triangles(spark, sf).collect()[0].n_triangles == 10
    hist = {r.degree: r.n_customers for r in bq.copurchase_degree_hist(spark, sf).collect()}
    assert hist == {4: 5}
    clus = bq.copurchase_clustering_by_degree(spark, sf).collect()
    # K5: every node sits on C(4,2)=6 triangles and has 6 wedges
    assert len(clus) == 1 and clus[0].degree == 4
    assert clus[0].sum_triangles == 30 and clus[0].sum_wedges == 30


def test_load_table_handles_spark_written_int96_timestamps(spark, tmp_path):
    """Spark 4 writes TIMESTAMP columns as legacy INT96, which pyarrow
    ALSO reports as timestamp[ns] — load_table must not apply the
    TIMESTAMP(NANOS) div-1000 restore to them (it crashed with a type
    mismatch before the physical-type check).  Only INT64-ns columns
    (external writers, e.g. the driver fixture generator) get the
    conversion."""
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    df = spark.createDataFrame([(1,)], "k: long").select(
        "k", F.current_timestamp().alias("t")
    )
    df.write.parquet(str(tmp_path / "probe.parquet"))
    got = load_table(spark, str(tmp_path), "probe")
    assert dict(got.dtypes)["t"] == "timestamp"
    assert got.count() == 1
