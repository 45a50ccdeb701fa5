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


def test_expression_twins_analyzed_identical(spark):
    """The helper functions that switched to parsed-SQL bodies for
    string column names (uuid5, language id, token count, binary
    judgment, date splits) must build the exact analyzed plan of their
    Column forms — pinned here by forcing the Column path with a
    Column input."""
    from pyspark.sql import functions as F

    from swisscourtrulingcorpus_spark.extraction.ids import uuid5_col
    from swisscourtrulingcorpus_spark.functions.domain import (
        normalize_binary_judgment,
    )
    from swisscourtrulingcorpus_spark.functions.text import (
        language_id_score,
        token_count_ws,
    )

    df = spark.createDataFrame([("a b", ["approval"], 2017)], ["t", "j", "year"])
    pairs = [
        (uuid5_col("t"), uuid5_col(F.col("t"))),
        (language_id_score("t"), language_id_score(F.col("t"))),
        (token_count_ws("t"), token_count_ws(F.col("t"))),
        (
            normalize_binary_judgment("j"),
            normalize_binary_judgment(F.col("j")),
        ),
    ]
    for sql_form, col_form in pairs:
        a = _norm(df.select(sql_form.alias("o")))
        b = _norm(df.select(col_form.alias("o")))
        assert a == b, f"twin drift:\n{a}\n---\n{b}"


def test_lazy_tables_defer_and_memoize(spark):
    """run_extraction_pipeline returns a mapping whose derived tables
    construct on first access and memoize (same object on re-read,
    preserving the one-cache-entry semantics)."""
    from swisscourtrulingcorpus_spark.plans.domain_pipeline import (
        run_extraction_pipeline,
    )
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import (
        raw_corpus_df,
    )

    tables = run_extraction_pipeline(raw_corpus_df(spark, 10))
    assert set(tables) == {
        "decision", "section", "section_arrays", "citation", "judgment",
        "composition", "lower_court", "participation",
    }
    c1 = tables["citation"]
    assert c1 is tables["citation"]
    assert tables.get("missing", "d") == "d"
    assert tables["composition"].columns[0] == "decision_id"
    # items() materializes every table (the eager-consumer idiom)
    assert len(dict(tables.items())) == 8


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
