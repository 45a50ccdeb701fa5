"""PII redaction for training corpora (BASELINE.md north star: the
compliance pass every large-scale text pipeline runs before training).

The reference anonymizes rulings upstream of its pipeline (SURVEY §2
notes person names arrive pre-pseudonymized, e.g. ``A.________``); an
engine users switch to must carry the redaction step itself.  Patterns
target the Swiss-legal shapes that appear in rulings: e-mail, Swiss
phone numbers, AHV social-security numbers (756.xxxx.xxxx.xx), and
IBANs.

Everything is JVM-side ``regexp_replace`` / ``regexp_extract_all``
inside whole-stage codegen — zero shuffles, zero Python.  Every regex
sticks to the Java∩RE2 common subset (no backreferences, no lookaround)
so a DuckDB oracle runs the literally identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered list of (tag, pattern).  Order matters: e-mail before phone
# (digit runs inside mail-hosts must not half-match as phones), AHV
# before phone (756.xxxx… contains phone-length digit runs), IBAN last
# of the digit family (its alpha prefix keeps it unambiguous anyway).
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("AHV", r"756\.[0-9]{4}\.[0-9]{4}\.[0-9]{2}"),
    ("IBAN", r"\b[A-Z]{2}[0-9]{2}(?: ?[0-9A-Z]{4}){3,7}(?: ?[0-9A-Z]{1,3})?\b"),
    ("PHONE", r"(?:\+41|0041|0)[ ]?[0-9]{2}[ ]?[0-9]{3}[ ]?[0-9]{2}[ ]?[0-9]{2}\b"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its ``<TAG>`` placeholder, applying
    the patterns in the canonical order.  One chained JVM expression —
    Catalyst folds the four replaces into a single codegen stage."""
    c = F.col(col) if isinstance(col, str) else col
    for tag, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{tag}>")
    return c


def count_pii(col: Column | str, tag: str) -> Column:
    """Match count for one PII family on the ORIGINAL text (counts must
    be taken before redaction rewrites the string)."""
    pat = dict(PII_PATTERNS)[tag]
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def oracle_redact_sql(text_expr: str) -> str:
    """The DuckDB expression computing the identical redaction — the
    same patterns in the same order, with RE2's explicit 'g' flag."""
    expr = text_expr
    for tag, pat in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '<{tag}>', 'g')"
    return expr


def oracle_count_sql(text_expr: str, tag: str) -> str:
    """DuckDB expression for :func:`count_pii`."""
    pat = dict(PII_PATTERNS)[tag].replace("'", "''")
    return f"len(regexp_extract_all({text_expr}, '{pat}'))"
