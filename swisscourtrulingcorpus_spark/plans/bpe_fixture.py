"""Frozen-corpus definition shared by the BPE driver gates and the
fixture generator (`tools/make_bpe_fixture.py`).

The corpus is pure doc_id arithmetic (the image-fixture pattern), so it
is identical at every scale factor and in every engine: doc d's text is
``d % 9 + 3`` words drawn from a fixed 12-word vocabulary at positions
``(3d + 7j) % 12``.  The shared-suffix vocabulary (-er/-est pairs)
gives the trainer a rich, deterministic merge sequence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_FIXTURE_WORDS = [
    "lower",
    "lowest",
    "newer",
    "newest",
    "wider",
    "widest",
    "slower",
    "slowest",
    "deeper",
    "deepest",
    "steeper",
    "steepest",
]

# doc_ids 0..N-1 participate — present at every SF (sf0.001 already has
# 500 documents).
BPE_FIXTURE_DOCS = 300

# Number of merges the frozen fixture holds; the generator asserts the
# reference trainer actually produces this many on the corpus.
BPE_FIXTURE_MERGES = 20


def bpe_fixture_text(d: int) -> str:
    """Pure-Python twin of :func:`bpe_fixture_text_col`."""
    n = d % 9 + 3
    return " ".join(
        BPE_FIXTURE_WORDS[(3 * d + 7 * j) % 12] for j in range(n)
    )


def bpe_fixture_text_col(doc_id: str = "doc_id") -> Column:
    """The corpus text as a JVM-side column expression over doc_id —
    no Python in the construction path."""
    words = ", ".join(f"'{w}'" for w in BPE_FIXTURE_WORDS)
    return F.expr(
        f"concat_ws(' ', transform(sequence(0, CAST({doc_id} % 9 + 2 AS INT)),"
        f" j -> element_at(array({words}),"
        f" CAST((3 * {doc_id} + 7 * j) % 12 AS INT) + 1)))"
    )
