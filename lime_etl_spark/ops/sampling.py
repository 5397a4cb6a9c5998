"""Deterministic splitting and sampling (training-data preparation).

randomSplit/sample are nondeterministic across runs and cluster
layouts — useless for reproducible train/eval splits. These operators
derive membership from a portable content hash (md5-prefix as integer,
the same construction ops/dedup.py uses), so:

- the split is a pure function of the row key: stable across runs,
  engines, partitionings, and cluster sizes;
- rows added to the corpus later don't reshuffle existing assignments;
- the DuckDB oracle reproduces assignments bit-for-bit (no RNG state
  to share).

Both are narrow (no shuffle): hash + modulo per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, buckets: int = 100) -> Column:
    """Portable hash bucket in [0, buckets): first 15 md5 hex digits as
    int64 (non-negative), mod buckets. Matches DuckDB
    ('0x'||substr(md5(x),1,15))::BIGINT % buckets."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")
    return h % F.lit(buckets)


def with_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 90,
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign train/eval by hash bucket: bucket < train_pct -> train.

    ``salt`` derives independent splits from the same keys (e.g. one
    per experiment) — concatenated into the hashed value, not a second
    column, so the oracle twin stays a single expression."""
    b = _bucket(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn(
        out, F.when(b < train_pct, F.lit("train")).otherwise(F.lit("eval"))
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Deterministic ~pct% sample: hash(key + salt) bucket < pct. The
    hash is uniform, so any stratum (label, language, source) thins by
    the same factor without per-stratum state — stratification for
    free, reproducible across runs and engines."""
    b = _bucket(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.filter(b < pct)
