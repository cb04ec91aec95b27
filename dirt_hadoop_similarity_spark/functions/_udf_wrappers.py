"""Pandas-UDF construction helpers.

Kept in a module WITHOUT ``from __future__ import annotations`` so the
pd.Series type hints stay live objects — PySpark inspects them to pick
the SCALAR pandas-UDF execution path (Arrow-batched).
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_series_udf(fn, return_type=None, passthrough_null=False):
    """Wrap a plain ``str -> str`` (or scalar -> scalar) Python function
    into an Arrow-vectorized pandas UDF."""
    rt = return_type or T.StringType()

    if passthrough_null:

        def _apply(s: pd.Series) -> pd.Series:
            return s.map(lambda v: fn(v) if v is not None else None)

    else:

        def _apply(s: pd.Series) -> pd.Series:
            return s.map(fn)

    return F.pandas_udf(_apply, rt)
