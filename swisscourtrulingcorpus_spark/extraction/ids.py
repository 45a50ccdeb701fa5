"""Deterministic decision ids (SURVEY.md §1.2).

The reference derives decision_id as
``uuid.uuid5(uuid.UUID(int=0), file_name)``
(`scrc/utils/sql_select_utils.py:168`) so re-ingesting the same file
yields the same id.  Kept bit-identical here — a pandas_udf because
there is no SQL uuid5 — so ids are reproducible across engines and
rounds (idempotent upserts depend on it).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_NAMESPACE = uuid.UUID(int=0)


def uuid5_py(name: str | None) -> str | None:
    if name is None:
        return None
    return str(uuid.uuid5(_NAMESPACE, name))


@pandas_udf(StringType())
def uuid5_udf(name: pd.Series) -> pd.Series:
    return name.map(uuid5_py)
