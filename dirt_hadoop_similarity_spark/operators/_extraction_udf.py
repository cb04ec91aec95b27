"""Pandas-UDF plumbing for path extraction (no future-annotations so the
pd.Series hints stay live for PySpark's signature inspection)."""

import pandas as pd
from pyspark.sql import functions as F

_RESULT_TYPE = "array<struct<path:string,x:string,y:string>>"


def make_extract_udf(extract_fn):
    def _extract(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda toks: extract_fn(_as_dicts(toks)))

    return F.pandas_udf(_extract, _RESULT_TYPE)


def _as_dicts(toks):
    """Arrow hands array<struct> to pandas as a numpy array of dicts (or
    None); normalize to a plain list of dicts."""
    if toks is None:
        return []
    return [t if isinstance(t, dict) else dict(t) for t in toks]
