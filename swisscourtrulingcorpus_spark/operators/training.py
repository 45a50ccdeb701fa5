"""Training-data preparation operators (beyond the reference's surface;
BASELINE.md north star: the ops a 100 TB LLM-corpus pipeline needs).

- ``chunk_documents``: split each document into token-bounded chunks
  with overlap — the standard pretraining/embedding preprocessing step.
  Pure map-side (sequence + slice + posexplode inside codegen): a doc
  becomes ceil((n - overlap) / step) rows with NO shuffle; the wide
  text column is projected away before any exchange downstream.
- ``deterministic_shuffle``: a reproducible global permutation by
  hashing the id with a seed — training-order shuffling that any engine
  (and any rerun) reproduces bit-for-bit, unlike rand()-based orderings.
  At scale this is a total sort: one range-partitioned exchange, the
  standard cost of producing a globally-ordered training manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from swisscourtrulingcorpus_spark.functions.hashing import normalize_ws


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): whitespace tokens ``[start, start +
    chunk_size)`` with consecutive chunks overlapping by ``overlap``
    tokens.  Chunk starts are ``1, 1+step, ...`` up to ``max(n -
    overlap, 1)`` (step = chunk_size - overlap), so the trailing chunk
    is never empty and never fully contained in its predecessor.

    ``chunk_idx`` is derived as ``(start - 1) / step`` — arithmetic the
    SQL oracle reproduces without needing ordinality.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    words = df.select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("__w")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__w") - overlap, F.lit(1)), F.lit(step)
    )
    chunked = words.select(
        id_col,
        F.size("__w").alias("__n"),
        F.explode(starts).alias("__s"),
        F.col("__w"),
    )
    return chunked.select(
        id_col,
        ((F.col("__s") - 1) / step).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(F.col("__w"), F.col("__s"), chunk_size)).alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_size), F.col("__n") - F.col("__s") + 1).alias(
            "n_chunk_tokens"
        ),
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "42"
) -> Column:
    """Reproducible global shuffle rank: ``row_number`` over
    ``md5(seed|id)`` (ties broken by id).  Engine-independent (md5) and
    rerun-stable, unlike ``rand()``-seeded ordering which is tied to one
    engine's RNG and partitioning."""
    key = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    w = Window.orderBy(key.asc(), F.col(id_col).asc())
    return F.row_number().over(w)
