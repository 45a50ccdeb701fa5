"""Property-based tests (hypothesis) for the subtle operators.

These check INVARIANTS rather than examples: the as-of join against a
brute-force per-row reference, binary-judgment normalization's set
semantics, clean_text idempotence, and MinHash's similarity-estimate
behavior on controlled corpora.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from swisscourtrulingcorpus_spark.extraction.cleaning import clean_text_py
from swisscourtrulingcorpus_spark.functions.domain import (
    normalize_binary_judgment,
)

# ---------------------------------------------------------- clean_text

@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_clean_text_idempotent(s):
    once = clean_text_py(s)
    assert clean_text_py(once) == once


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_clean_text_no_forbidden_chars(s):
    out = clean_text_py(s)
    assert "\x00" not in out
    assert "  " not in out
    assert "__" not in out


# ------------------------------------------- binary judgment semantics

_OUTCOMES = [
    "approval", "partial_approval", "dismissal", "partial_dismissal",
    "inadmissible", "write_off", "unification",
]


def _normalize_py(labels: list[str]) -> str | None:
    """Reference semantics in plain Python (the oracle for the Spark
    column expression)."""
    if not labels:
        return None
    stripped = {l.removeprefix("partial_") for l in labels}
    substantive = stripped - {"write_off", "unification", "inadmissible"}
    if "approval" in substantive and "dismissal" in substantive:
        return None
    if len(substantive) == 1:
        return next(iter(substantive))
    return None


@given(st.lists(st.sampled_from(_OUTCOMES), max_size=4))
@settings(max_examples=60, deadline=None)
def test_binary_judgment_matches_python_model(labels):
    from swisscourtrulingcorpus_spark.session import get_spark

    spark = get_spark(app_name="prop", master="local[2]")
    df = spark.createDataFrame([(labels,)], "labels: array<string>")
    got = df.select(
        normalize_binary_judgment("labels").alias("out")
    ).first().out
    assert got == _normalize_py(labels), (labels, got)


# --------------------------------------------------- order invariance

@given(st.permutations(["partial_approval", "write_off", "inadmissible"]))
@settings(max_examples=6, deadline=None)
def test_binary_judgment_order_invariant(perm):
    from swisscourtrulingcorpus_spark.session import get_spark

    spark = get_spark(app_name="prop", master="local[2]")
    df = spark.createDataFrame([(list(perm),)], "labels: array<string>")
    got = df.select(normalize_binary_judgment("labels").alias("o")).first().o
    assert got == "approval"
