"""Portable hashing + shingling primitives.

Everything downstream of dedup/fingerprinting needs a hash that (a) runs
JVM-side in whole-stage codegen (no Python), (b) is engine-independent so
a SQL oracle (DuckDB) reproduces it bit-for-bit, and (c) is stable across
runs/versions (``xxhash64``/``hash`` differ between engines; md5 doesn't).

``h32``: first 8 hex chars of md5 → unsigned 32-bit int carried in a
BIGINT.  One md5 per (seed, shingle) pair is the entire CPU cost of
MinHash; at 100 TB this is embarrassingly parallel map-side work with no
shuffle until the per-document ``min()`` aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column | str, seed: str | None = None) -> Column:
    """Portable 32-bit hash as BIGINT: ``int(md5(seed|x)[:8], 16)``.

    DuckDB oracle equivalent: ``('0x' || substr(md5(seed||'|'||x),1,8))::UBIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def normalize_ws(col: Column | str) -> Column:
    """Lowercase + whitespace-collapse + trim — the normalization both the
    Spark side and the oracle apply before tokenizing (mirrors the
    whitespace-collapse step of the reference's ``clean_text``,
    `scrc/utils/main_utils.py:130-133`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of a normalized text, as ``array<string>``.

    Built-ins only (`split` + `transform` over an index `sequence`) so the
    whole shingling stage stays inside whole-stage codegen — no UDF.
    Guard: Spark's ``sequence(1, n)`` DESCENDS when n < 1, so short
    documents (< k words) must return an empty array explicitly.
    """
    words = F.split(normalize_ws(col), " ")
    n_shingles = F.size(words) - (k - 1)
    idx = F.when(n_shingles >= 1, F.sequence(F.lit(1), n_shingles)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + off) for off in range(k)]
        ),
    )
