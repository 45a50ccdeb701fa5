"""Bucketed co-located join: zero exchanges on the fact-fact join."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir, explain_plan):
    from swisscourtrulingcorpus_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from swisscourtrulingcorpus_spark.sources.catalog import load_table

    # clean any leftover managed-table locations from prior runs
    import shutil

    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "key"
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "key"
    )
    write_bucketed(orders, "t_orders_b", "key", 8, sort_col="key")
    write_bucketed(li, "t_lineitem_b", "key", 8, sort_col="key")

    # at test SF Spark would broadcast (rightly); disable it to exercise
    # the fact⋈fact shape bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "key")
        agg = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        rows = {r.o_orderstatus: r.n for r in agg.collect()}
        assert sum(rows.values()) == li.count()  # inner join: all lineitems hit
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # inspect the EXECUTED aggregation plan (the join sits inside it):
    # the groupBy needs one Exchange; the co-bucketed join needs NONE
    agg.collect()  # AQE: the final plan exists after execution
    plan = explain_plan(agg, "extended")
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final, final
    assert final.count("Exchange") == 1, final

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
