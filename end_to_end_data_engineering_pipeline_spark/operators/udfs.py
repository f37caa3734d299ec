"""Arrow-vectorized pandas UDFs — the sanctioned Python escape hatch.

Engine policy (SURVEY §2.10): hot paths stay JVM-side; when Python is
unavoidable, it enters ONLY as `@pandas_udf` / `mapInPandas` (Arrow
batch transfer, ~10-100x over row-at-a-time Python UDFs). This module
keeps reference vectorized twins of JVM expressions so the policy is
testable: each pandas UDF must produce byte-identical output to its
codegen'd counterpart (tests/test_textops.py::test_pandas_udf_parity),
proving the Python boundary adds no semantic drift — the property that
lets an operator migrate between the two tiers freely when profiling
says so.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def normalize_text_pandas(s: pd.Series) -> pd.Series:
    """Vectorized twin of operators/text.py:normalize_text
    (lowercase + trim + collapse whitespace)."""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@pandas_udf("long")
def token_count_pandas(s: pd.Series) -> pd.Series:
    """Vectorized twin of the whitespace token count in
    operators/text.py:text_stats."""
    return s.str.strip().str.split(r"\s+").str.len().astype("int64")


def normalized_text_py(col: Column) -> Column:
    """The pandas-UDF path as a drop-in for normalize_text."""
    return normalize_text_pandas(col)
