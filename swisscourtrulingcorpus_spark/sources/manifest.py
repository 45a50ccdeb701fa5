"""Incremental processing (SURVEY.md §2.10 — "streaming" as incremental batch).

The reference threads `decision_ids` between stages and keeps progress
txt files (`abstract_preprocessor.py:122-140`, `abstract_extractor.py:
69-77`).  The lakehouse-native equivalent is a *manifest table*: a tiny
table of already-processed keys; the next run anti-joins against it.

At 100 TB the manifest stays small relative to the corpus (keys only),
so the anti-join broadcasts; if it ever grows past broadcast size it
degrades gracefully to a shuffled semi-join — same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows_only(incoming: DataFrame, manifest: DataFrame | None, keys: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose key is NOT in the manifest (J7 anti-join;
    `text_to_database.py:135-145` skip-already-ingested)."""
    if manifest is None:
        return incoming
    # No broadcast hint: the manifest GROWS with the corpus (every key
    # ever processed), so forcing it executor-resident would eventually
    # OOM.  Left to the optimizer, a young manifest broadcasts (under
    # autoBroadcastJoinThreshold) and a billion-key manifest degrades
    # gracefully to a shuffled anti-join on the key columns only.
    return incoming.join(
        manifest.select(*keys).distinct(), on=keys, how="left_anti"
    )


def processed_union(manifest: DataFrame | None, processed: DataFrame, keys: list[str]) -> DataFrame:
    """Append newly-processed keys to the manifest (U2 progress union)."""
    new_keys = processed.select(*keys).distinct()
    if manifest is None:
        return new_keys
    return manifest.select(*keys).unionByName(new_keys).distinct()
