#!/usr/bin/env python
"""Normalized optimized-plan fingerprints for the extraction pipeline.

The whole-query SQL-text / lazy-construction work (r12, session 2)
must not change what any pipeline consumer computes.  This prints one
fingerprint per pipeline output (the same exprId-normalized optimized
plan hash the registry duplicate-lint uses) so a before/after diff
proves the plans are untouched.

Usage: python tools/pipeline_fingerprint.py [n_docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swisscourtrulingcorpus_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark(app_name="pipeline_fingerprint")
    spark.sparkContext.setLogLevel("ERROR")

    from swisscourtrulingcorpus_spark.plans.domain_pipeline import (
        judgment_dataset,
        run_extraction_pipeline,
    )
    from swisscourtrulingcorpus_spark.plans.parity import plan_fingerprint
    from swisscourtrulingcorpus_spark.sources.domain_fixtures import (
        raw_corpus_df,
    )

    tables = run_extraction_pipeline(raw_corpus_df(spark, n))
    for name in sorted(tables):
        print(f"{name}: {plan_fingerprint(tables[name])}")
    print(f"judgment_dataset: {plan_fingerprint(judgment_dataset(tables))}")
    spark.stop()


if __name__ == "__main__":
    main()
