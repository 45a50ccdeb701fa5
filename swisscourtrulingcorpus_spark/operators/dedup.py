"""Deduplication operators for large-scale training-data pipelines.

Four escalating strategies, all expressed with built-in DataFrame ops
(JVM-side, codegen-friendly, no Python in the hot path):

- exact           : hash-groupBy on the full text. One shuffle.
- MinHash + LSH   : shingle → 32-bit portable hashes → per-doc min per
                    permutation → band → bucket join. The standard
                    near-dup pipeline (Broder '97 / Lee et al.
                    "Deduplicating Training Data Makes Language Models
                    Better").  Shuffle cost: one groupBy(doc) + one
                    self-join on band keys (tiny signature table).
- SimHash         : per-bit majority vote over shingle hashes
                    (Charikar '02); signature computed in one groupBy.
- n-gram Jaccard  : exact set similarity via an inverted shingle index
                    self-join — with stop-shingle removal so a frequent
                    shingle can't quadratically explode the join (the
                    classic scale failure mode of naive similarity join).

All hashes go through ``functions.hashing.h32`` (md5-based) so the
DuckDB oracle reproduces every number exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.functions.hashing import (
    h32,
    normalize_ws,
    word_shingles_from_words,
)

NUM_MINHASH = 8
LSH_BANDS = 4  # 8 hashes / 4 bands => 2 rows per band


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups: keep min(id) per identical text, report
    group size (P9 `drop_duplicates` analogue, `dataset_creator.py:540`).

    groupBy on the text hash, not the text itself, so the shuffle moves
    16-byte keys instead of multi-KB documents at 100 TB.
    """
    return (
        df.select(F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h")
    )


def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """One row per (doc, distinct shingle). The words array materializes
    in its own projection (so normalize+split runs once per row — see
    word_shingles_from_words), and the explode happens AFTER projecting
    away the document text, so the wide column never shuffles."""
    words = df.select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("__w")
    )
    return words.select(
        id_col,
        F.explode(
            F.array_distinct(word_shingles_from_words(F.col("__w"), k))
        ).alias("shingle"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
) -> DataFrame:
    """Per-document MinHash signature: for permutation j, the min of the
    seeded 32-bit hash over the doc's distinct shingles.  Columns
    ``mh0..mh{n-1}`` (BIGINT).  Empty docs (< k words) drop out —
    they have no shingles, hence no signature (same as the oracle).
    """
    shingled = _shingled(df, text_col, id_col, k)
    aggs = [
        F.min(h32(F.col("shingle"), seed=str(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs agreeing on ALL hashes of at
    least one band.  Output (id_a < id_b) distinct.

    The self-join runs on the signature table (one short row per doc),
    never on the corpus — at 100 TB the bucket join input is ~0.01% of
    the data.  Skewed buckets (many docs sharing a band) are AQE's
    skew-join case.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.lit(str(b))] + [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(F.concat_ws("|", *parts))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band_key")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, on="band_key")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = NUM_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Scale path for LSH dedup: per-document cluster REPRESENTATIVE
    instead of candidate pairs.

    Pair enumeration is quadratic in duplicate-group size (a 10k-copy
    boilerplate document yields 50M pairs — measured: a 20×-duplicated
    100k-doc corpus produced 1.3M pairs).  Production dedup instead
    assigns each doc the min id over its LSH buckets: one row per doc,
    ``keep = (representative == id)``.  This is the single-pass
    min-over-buckets approximation of connected components — docs
    sharing any band collapse to one survivor; chains longer than one
    hop may keep an extra doc (acceptable for near-dup dedup, and the
    standard trade in large-scale pipelines).

    Cost: two shuffles (bucket min, doc min) over short rows, NO
    quadratic term.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.lit(str(b))] + [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(F.concat_ws("|", *parts))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band_key")
    )
    bucket_min = banded.groupBy("band_key").agg(
        F.min(id_col).alias("bucket_rep")
    )
    return (
        banded.join(bucket_min, on="band_key")
        .groupBy(id_col)
        .agg(F.min("bucket_rep").alias("representative"))
        .select(
            id_col,
            "representative",
            (F.col("representative") == F.col(id_col)).alias("keep"),
        )
    )


def simhash64(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, bits: int = 32
) -> DataFrame:
    """SimHash signature: bit b of the signature is the majority vote of
    bit b across the doc's shingle hashes.  One groupBy(doc) computing
    ``bits`` conditional sums — a single shuffle, all codegen.
    """
    shingled = _shingled(df, text_col, id_col, k).select(
        id_col, h32(F.col("shingle"), seed="sim").alias("__h")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"__v{b}")
        for b in range(bits)
    ]
    per_doc = shingled.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"__v{b}") >= 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 rare shingle.

    Inverted-index self-join: explode distinct shingles, drop shingles
    appearing in more than ``max_doc_freq`` docs (stop-shingle removal —
    without it one ubiquitous shingle makes the join quadratic), join on
    shingle, count shared, Jaccard = shared / (|A| + |B| - shared).
    """
    shingled = _shingled(df, text_col, id_col, k).cache()
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    doc_freq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = shingled.join(
        F.broadcast(doc_freq.where(F.col("df") <= max_doc_freq)), on="shingle"
    ).select(id_col, "shingle")

    a = rare.withColumnRenamed(id_col, "id_a")
    b = rare.withColumnRenamed(id_col, "id_b")
    shared = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        shared.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .select(
            "id_a",
            "id_b",
            # int/int division -> identical double in Spark and DuckDB;
            # no round() (engines' rounding of doubles differs).
            (F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
