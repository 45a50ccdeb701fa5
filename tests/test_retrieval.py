"""Inverted-index retrieval (operators/retrieval.py).

The oracle gate (`bm25_query_topk`) value-checks the inline path; these
cover the MATERIALIZED regime — index written term-partitioned to
parquet, reopened, searched without the corpus — plus scoring
invariants the gate's fixed workload can't isolate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from swisscourtrulingcorpus_spark.operators.retrieval import (
    bm25_search,
    build_postings,
    write_postings,
)
from swisscourtrulingcorpus_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _queries(spark):
    return spark.createDataFrame(
        [("qa", "hash join"), ("qb", "stream window table")],
        ["query_id", "text"],
    )


def test_materialized_index_matches_inline_search(spark, corpus, tmp_path):
    """write_postings -> reopen -> search gives byte-identical results
    to searching the in-memory build; the reopened search never touches
    the documents table."""
    index = build_postings(corpus)
    path = str(tmp_path / "idx")
    write_postings(index, path)
    reopened = {
        "postings": spark.read.parquet(f"{path}/postings"),
        "df": spark.read.parquet(f"{path}/df"),
        "scalars": spark.read.parquet(f"{path}/scalars"),
    }
    q = _queries(spark)
    inline = sorted(map(tuple, bm25_search(index, q, k=10).collect()))
    served = sorted(map(tuple, bm25_search(reopened, q, k=10).collect()))
    assert inline == served
    assert len(served) > 0


def test_postings_carry_doc_length_norm(spark, corpus):
    """The impact-index denormalization: every posting row carries its
    document's length, equal to the sum of the doc's tfs."""
    index = build_postings(corpus)
    bad = (
        index["postings"]
        .groupBy("doc_id", "dl")
        .agg(F.sum("tf").alias("sum_tf"))
        .where(F.col("dl") != F.col("sum_tf"))
        .count()
    )
    assert bad == 0


def test_unmatched_query_terms_prune_not_fail(spark, corpus):
    """A query made only of out-of-vocabulary terms returns no rows
    (inner-join pruning), and mixed queries only score matched terms."""
    index = build_postings(corpus)
    q = spark.createDataFrame(
        [("q_oov", "zzzz yyyy"), ("q_mix", "hash zzzz")], ["query_id", "text"]
    )
    rows = bm25_search(index, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "q_oov" not in by_q
    assert all(r["n_hit_terms"] == 1 for r in by_q["q_mix"])


def test_rank_is_dense_and_score_sorted(spark, corpus):
    index = build_postings(corpus)
    rows = bm25_search(index, _queries(spark), k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_merge_postings_equals_rebuild(spark, corpus):
    """merge(base, delta) must equal build(all) on every table —
    including the mergeable scalar pair — so incremental maintenance
    can run forever without drifting from a rebuild."""
    from swisscourtrulingcorpus_spark.operators.retrieval import merge_postings

    base = build_postings(corpus.where(F.col("doc_id") % 3 != 0))
    delta = build_postings(corpus.where(F.col("doc_id") % 3 == 0))
    merged = merge_postings(base, delta)
    full = build_postings(corpus)
    for key in ("postings", "df"):
        got = sorted(map(tuple, merged[key].collect()))
        want = sorted(map(tuple, full[key].collect()))
        assert got == want, key
    ms = merged["scalars"].collect()[0]
    fs = full["scalars"].collect()[0]
    assert (ms["n_docs"], ms["total_dl"]) == (fs["n_docs"], fs["total_dl"])
    assert ms["avgdl"] == fs["avgdl"]
    # search over the merged index == search over the rebuilt index
    q = _queries(spark)
    assert sorted(map(tuple, bm25_search(merged, q, k=5).collect())) == sorted(
        map(tuple, bm25_search(full, q, k=5).collect())
    )


def test_materialized_search_pushes_term_filter_to_scan(spark, corpus, tmp_path):
    """r06 review: a broadcast join pushes nothing into a parquet scan
    — the prune_terms IN predicate must reach the postings scan's
    PushedFilters so the term-sorted row groups can be skipped."""
    from conftest import explain_plan_str

    index = build_postings(corpus)
    path = str(tmp_path / "idx2")
    write_postings(index, path)
    reopened = {
        "postings": spark.read.parquet(f"{path}/postings"),
        "df": spark.read.parquet(f"{path}/df"),
        "scalars": spark.read.parquet(f"{path}/scalars"),
    }
    df = bm25_search(reopened, _queries(spark), k=5)
    plan = explain_plan_str(df, "formatted")
    assert "In(term, [" in plan, plan


def test_bm25_hard_negatives_exclude_source_doc(spark, sf_dir):
    """Hard negatives never include the query's own source document,
    neg_rank is dense 1..5 per query, and scores are monotone in rank."""
    from swisscourtrulingcorpus_spark.plans.retrieval_queries import (
        bm25_hard_negatives,
    )

    rows = bm25_hard_negatives(spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r.doc_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_micro for r in rs]
        assert scores == sorted(scores, reverse=True)
