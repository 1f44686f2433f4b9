"""UDF escape hatches (SURVEY §2.10).

The engine's policy is built-ins first: every hot-path expression in
operators/ is JVM-side. These Arrow-vectorized pandas UDFs exist as
the sanctioned escape hatch for logic Spark genuinely can't express —
and as parity fixtures proving the built-in paths match a Python
reference implementation (the U2 test in tests/test_misc_io.py).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf


# NB: explicit type objects, not DDL strings — parsing "string" at
# decoration time requires an active SparkSession (import-order trap).
@pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    """Vectorized twin of the built-in normalize chain
    (lower → trim → collapse whitespace; universe.py:17-22).
    Arrow-batched: ~10-100× a row-at-a-time Python UDF."""
    return s.str.lower().str.strip().map(lambda x: re.sub(r"\s+", " ", x)
                                         if x is not None else None)


@pandas_udf(T.DoubleType())
def weighted_mid_udf(bid: pd.Series, ask: pd.Series,
                     bid_sz: pd.Series, ask_sz: pd.Series) -> pd.Series:
    """Example numeric kernel: size-weighted midprice — the sort of
    per-row finance math users may want as a custom function."""
    tot = bid_sz + ask_sz
    return (bid * ask_sz + ask * bid_sz) / tot.where(tot != 0)


def builtin_normalize(col):
    """The JVM-side normalize chain the UDF mirrors."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
