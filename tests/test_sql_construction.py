"""Whole-query SQL-text construction equivalence (r12, session 2).

Each converted headline query keeps its former DataFrame-API
construction as a private ``_q_<name>_df`` twin.  The live gate builds
the SAME logical query as ONE parsed ``spark.sql`` statement (a py4j
round trip per DataFrame method is the dominant construction cost the
bench times — guide §1).  This test pins the equivalence at its
strongest practical level: the OPTIMIZED logical plans must be
string-identical modulo expression IDs and parser-assigned lambda
variable names.  Identical optimized plans mean identical physical
planning input, hence identical execution and results — stronger than
oracle-only equivalence.

Also covers the catalog helpers: ``table_view`` returns a registered
name with a warm zero-py4j path, and ``catalog_sql`` self-heals when a
cached temp view is dropped behind the cache.
"""

from __future__ import annotations

import re

import pytest


def _norm(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+L?", "#X", s)
    # the SQL parser names lambda args x/acc/v where the Column API
    # generates x_4, x_5, ... — same structure, different tags
    s = re.sub(r"lambda [a-z]+(_\d+)?", "lambda V", s)
    return s


def _twins():
    from swisscourtrulingcorpus_spark.plans import analytics_queries as aq
    from swisscourtrulingcorpus_spark.plans import relational_queries as rq
    from swisscourtrulingcorpus_spark.plans import text_queries as tq

    from swisscourtrulingcorpus_spark.plans import window_queries as wq

    return [
        ("q1_pricing_summary", rq._q1_df),
        ("coverage_by_region", rq._coverage_df),
        ("map_join_orders", rq._map_join_orders_df),
        ("semi_join_membership", rq._semi_join_membership_df),
        ("rollup_region_nation", rq._rollup_df),
        ("topk_orders_per_segment", rq._topk_orders_df),
        ("tumbling_hourly_events", wq._tumbling_hourly_df),
        ("session_windows_events", wq._session_windows_df),
        ("cosine_topk_bruteforce", tq._q_cosine_topk_df),
        ("chunked_documents", tq._q_chunked_documents_df),
        ("q3_shipping_priority", aq._q3_df),
        ("q5_supplier_volume", aq._q5_df),
        ("q18_large_orders", aq._q18_df),
        ("asof_purchase_attribution", rq._asof_purchase_attribution_df),
        ("training_shuffle_rank", tq._q_training_shuffle_df),
        ("tfidf_top_terms", tq._q_tfidf_top_terms_df),
        ("ngram_jaccard_pairs", tq._q_ngram_jaccard_df),
        ("test_set_contamination", tq._q_contamination_df),
        ("minhash_lsh_pairs", tq._q_minhash_lsh_pairs_df),
        ("minhash_dedup_groups", tq._q_minhash_dedup_groups_df),
    ]


def test_sql_twin_plans_identical(spark, sf_dir):
    from swisscourtrulingcorpus_spark.plans.registry import queries

    q = queries()
    for name, df_form in _twins():
        live = _norm(q[name](spark, sf_dir))
        twin = _norm(df_form(spark, sf_dir))
        assert live == twin, f"{name}: optimized plans differ\n{live}\n---\n{twin}"


def test_table_view_and_catalog_sql_self_heal(spark, sf_dir):
    from swisscourtrulingcorpus_spark.sources.catalog import (
        catalog_sql,
        table_view,
    )

    v1 = table_view(spark, sf_dir, "region")
    assert spark.sql(f"SELECT count(1) AS n FROM {v1}").collect()[0].n > 0
    # drop the view behind the cache: catalog_sql must re-register
    spark.catalog.dropTempView(v1)
    out = catalog_sql(
        spark, lambda: f"SELECT count(1) AS n FROM {table_view(spark, sf_dir, 'region')}"
    )
    assert out.collect()[0].n > 0
