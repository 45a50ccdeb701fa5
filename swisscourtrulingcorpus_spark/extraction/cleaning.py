"""E2 Cleaner — full-fidelity text cleaning (SURVEY.md §2.7 F1).

The reference's ``clean_text`` (`scrc/utils/main_utils.py:113-139`)
NFKC-normalizes, strips control characters by unicode category,
de-hyphenates line breaks, replaces NBSP, collapses whitespace and
repeated underscores.  The regex-only subset lives as built-ins in
``functions.text.clean_text_col`` (codegen-friendly, keeps pushdown);
this pandas_udf is the full-fidelity path including the
``unicodedata`` steps Spark has no built-in for.

Vectorized per Arrow batch; the per-string work is pure-Python but
bounded by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
so executor memory stays flat at any corpus size.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEHYPHEN = re.compile(r"(\w)[-­]\n(\w)")
_UNDERSCORES = re.compile(r"_+")
_WS = re.compile(r"\s+")


def clean_text_py(text: str | None) -> str | None:
    """One document; None passes through (extractors coalesce later)."""
    if text is None:
        return None
    t = unicodedata.normalize("NFKC", text)  # also folds NBSP -> space
    t = t.replace("\x00", "")
    t = _DEHYPHEN.sub(r"\1\2", t)
    # drop Cc/Cf control chars except the whitespace we collapse next
    t = "".join(
        ch
        for ch in t
        if ch in "\n\t " or not unicodedata.category(ch).startswith("C")
    )
    t = _UNDERSCORES.sub("_", t)
    t = _WS.sub(" ", t)
    return t.strip()


@pandas_udf(StringType())
def clean_text_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_text_py)
