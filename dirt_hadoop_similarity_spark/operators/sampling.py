"""Deterministic hash-based sampling and dataset splitting.

Training pipelines need splits and samples that are REPRODUCIBLE across
runs, engines, and partitionings — `rand()` gives none of that (it is
seeded per-partition, so a repartition reshuffles the sample).  The
standard fix is hash bucketing: a stable key is hashed, the hash taken
mod a fixed granularity, and thresholds on the bucket decide membership.
Properties:

  * deterministic: same key -> same split, on any cluster layout;
  * disjoint + exhaustive: thresholds partition the bucket space;
  * consistent across tables: anything sharing the key lands in the
    same split (join-safe — eval never leaks into train via a side
    table);
  * engine-portable: md5 is the hash, so DuckDB/Spark/anything agree
    bit-for-bit (the oracle checks this).

Narrow-waist with the rest of the engine: the hash is
`operators/dedup.hash60` (md5 -> first 60 bits as bigint), the same
primitive MinHash uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators.dedup import hash60

GRANULARITY = 10_000  # buckets; rates resolve to 0.01%


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, GRANULARITY) for a key column.  ``salt``
    decorrelates independent assignments over the same key (e.g. a
    split assignment and a subsampling decision must not align)."""
    return hash60(F.concat(F.lit(f"{salt}|"), key.cast("string"))) % GRANULARITY


def assign_split(df: DataFrame, key: str, splits: dict[str, float],
                 salt: str = "split") -> DataFrame:
    """Adds a ``split`` column. ``splits`` maps name -> fraction; the
    fractions must sum to 1 (the last split absorbs rounding)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = split_bucket(F.col(key), salt=salt)
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += splits[name]
        bounds.append((name, int(round(cum * GRANULARITY))))
    for name, bound in reversed(bounds):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, rate: float, key: str,
                         salt: str = "sample") -> DataFrame:
    """Keep a stable ``rate`` fraction of rows by key hash — the
    repartition-proof replacement for ``df.sample(rate)``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    bound = int(round(rate * GRANULARITY))
    return df.filter(split_bucket(F.col(key), salt=salt) < bound)


def stratified_sample(df: DataFrame, rates: dict[str, float], group_col: str,
                      key: str, default_rate: float = 0.0,
                      salt: str = "stratified") -> DataFrame:
    """Per-group Bernoulli rates — the source-rebalancing knob of a
    training-data mix (upsample books, downsample boilerplate-heavy web
    crawl).  Same hash-bucket determinism as :func:`deterministic_sample`;
    the group only selects the THRESHOLD, so a row's fate still depends
    only on (salt, key): tightening a group's rate yields a strict
    subset of its previous sample."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bound = F.lit(int(round(default_rate * GRANULARITY)))
    for g, r in rates.items():
        bound = F.when(
            F.col(group_col) == g, F.lit(int(round(r * GRANULARITY)))
        ).otherwise(bound)
    return df.filter(split_bucket(F.col(key), salt=salt) < bound)
