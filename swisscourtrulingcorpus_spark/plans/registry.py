"""Gate-checked query registry.

Each ``QuerySpec`` pairs a Spark DataFrame program with a DuckDB oracle
SQL string producing byte-identical values (same column names, same
rounding, same decimal arithmetic).  The driver's correctness gate runs
both at sf=0.01 and compares row-count + schema + order-insensitive
value hash — so every aggregate is aliased identically on both sides,
money math goes through DECIMAL(18,2) (exact, engine-independent) and
only lands in DOUBLE after the final exact sum, and timestamps are
formatted to strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


# The driver's correctness gate evaluates only the FIRST 50 registry
# entries each round.  Entries named here are pulled to the front (in
# this order) so queries that have never had a driver CORRECTNESS row
# get one before already-green queries are re-verified.
#
# Round-4 window: the 22 queries that never received a driver row in
# r01–r03 (all of round-3c's ANN/quality layer + the round-3
# annotation/analysis gates), the 4 gates that were driver-RED in r03
# (integer-sum dtype mismatch, now cast on both sides), the re-fixed
# building_violations_summary (same dtype class, caught by the now
# dtype-sensitive local replica), and uuid5_document_ids (3 rounds of
# no_oracle — now value-checked against a fixture parquet).
# tests/test_registry_window.py asserts this invariant mechanically.
_FRONT_OF_WINDOW: list[str] = [
    # never driver-checked (r01–r03)
    "gopher_quality_filter",
    "transitive_cluster_chains",
    "building_violations_summary",
    "tei_corpus_extracted",
    "term_definitions_extracted",
    "court_chambers_flattened",
    "iaa_token_agreement",
    "occlusion_explainability",
    "rouge_token_agreement",
    "occlusion_test_set",
    "span_token_join",
    "ivf_assignment",
    "pq_codes_embeddings",
    "vocab_top_tokens",
    "data_quality_report",
    "skew_report_orders",
    "repetition_filter_documents",
    "token_ids_documents",
    "trained_language_id",
    "ivfpq_codes_embeddings",
    "hashed_bow_embeddings",
    "table_profile_orders",
    # driver-RED in r03, dtype fix needs a green driver row
    "q12_late_shipment_priority",
    "citation_type_counts",
    "sequence_packing_documents",
    "fundamental_importance_by_year",
    # err: no_oracle in r01–r03, now has a fixture-backed oracle
    "uuid5_document_ids",
    # round-4 new gates
    "lemma_counts_documents",
    "png_decode_stats",
    "pos_proxy_counts",
    "bloom_prefilter_orders",
    "length_grouped_shards",
    "stratified_sample_documents",
    "incremental_minhash_dedup",
    "ngram_lm_counts",
    "lm_coverage_documents",
]

# Round-3 gate queries, kept immediately after the front-of-window
# block (driver-green in r03; they backfill the window's remaining
# slots in stable order).
#
# ROTATION NOTE FOR ROUND 5: after CORRECTNESS_r04.json lands, run
# ``python -c "from swisscourtrulingcorpus_spark.plans.registry import
# unverified_backlog; print(unverified_backlog())"`` — any name it
# prints has no driver row yet and must be promoted into
# _FRONT_OF_WINDOW (tests/test_registry_window.py enforces this
# mechanically; every round-4 gate sits inside the current window, so
# the expected backlog is empty).
_ROUND3_NEW: set[str] = {
    "extraction_outcome_counts",
    "citation_relevance_scores",
    "citation_type_counts",
    "lower_court_extracted",
    "composition_extracted",
    "participation_extracted",
    "bge_reference_extracted",
    "pdf_text_extracted",
    "fundamental_importance_by_year",
    "paragraph_dedup_documents",
    "gopher_quality_filter",
    "transitive_cluster_chains",
    # OLAP completeness pack II (olap_queries2) — completes all 22
    # classic TPC-H shapes; never driver-verified before r03.
    "q8_national_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_promotion_candidates",
    "q21_waiting_suppliers",
    # training-pipeline additions (training_queries)
    "sequence_packing_documents",
    "pii_redaction_documents",
    "domain_mix_documents",
    "scd2_user_state",
    "building_violations_summary",
    "tei_corpus_extracted",
    # annotation-subtree gates (annotation_queries, declared last so the
    # never-verified backlog keeps its window slots; the first of these
    # fills slot 50, the rest rotate into the window next round)
    "prodigy_annotation_set",
    "iaa_token_agreement",
    "occlusion_explainability",
    "term_definitions_extracted",
    "rouge_token_agreement",
    "court_chambers_flattened",
    "occlusion_test_set",
    "span_token_join",
    "semantic_dedup_groups",
    "leakage_safe_split",
    "cms_token_estimates",
    "input_length_buckets",
    # round-3c ANN layer + data quality (ann_queries)
    "ivf_assignment",
    "pq_codes_embeddings",
    "vocab_top_tokens",
    "data_quality_report",
    "skew_report_orders",
    "repetition_filter_documents",
    "token_ids_documents",
    "trained_language_id",
    "ivfpq_codes_embeddings",
    "hashed_bow_embeddings",
    "table_profile_orders",
}


def _collect_specs() -> list[QuerySpec]:
    from swisscourtrulingcorpus_spark.plans import analytics_queries
    from swisscourtrulingcorpus_spark.plans import ann_queries
    from swisscourtrulingcorpus_spark.plans import extra_queries
    from swisscourtrulingcorpus_spark.plans import annotation_queries
    from swisscourtrulingcorpus_spark.plans import extraction_queries
    from swisscourtrulingcorpus_spark.plans import olap_queries
    from swisscourtrulingcorpus_spark.plans import olap_queries2
    from swisscourtrulingcorpus_spark.plans import training_queries
    from swisscourtrulingcorpus_spark.plans import relational_queries
    from swisscourtrulingcorpus_spark.plans import text_queries
    from swisscourtrulingcorpus_spark.plans import window_queries

    specs: list[QuerySpec] = []
    specs += relational_queries.SPECS
    specs += text_queries.SPECS
    specs += window_queries.SPECS
    specs += extra_queries.SPECS
    specs += analytics_queries.SPECS
    specs += olap_queries.SPECS
    specs += olap_queries2.SPECS
    specs += training_queries.SPECS
    specs += extraction_queries.SPECS
    specs += annotation_queries.SPECS
    specs += ann_queries.SPECS
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"

    rank = {name: i for i, name in enumerate(_FRONT_OF_WINDOW)}
    # Front-of-window names first (declared order), then round-3
    # additions (extraction_queries), then the r02-green remainder in
    # stable declaration order.
    def key(item: tuple[int, QuerySpec]) -> tuple[int, int]:
        idx, spec = item
        if spec.name in rank:
            return (0, rank[spec.name])
        if spec.name in _ROUND3_NEW:
            return (1, idx)
        return (2, idx)

    ordered = [s for _, s in sorted(enumerate(specs), key=lambda t: key(t))]
    return ordered


QUERY_SPECS: list[QuerySpec] = _collect_specs()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark for s in QUERY_SPECS}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in QUERY_SPECS if s.oracle is not None}


def driver_checked_names(repo_root: str | None = None) -> set[str]:
    """Names with at least one driver CORRECTNESS row (any round),
    read from the committed CORRECTNESS_r*.json files."""
    import glob
    import json
    import os

    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p) as f:
            seen |= set(json.load(f))
    return seen


def unverified_backlog() -> list[str]:
    """Queries outside the driver's 50-entry window that have never had
    a driver CORRECTNESS row — the promotion list for the next round's
    _FRONT_OF_WINDOW.  tests/test_registry_window.py asserts this is
    empty (every never-checked query fits in the current window)."""
    checked = driver_checked_names()
    return [s.name for s in QUERY_SPECS[50:] if s.name not in checked]
