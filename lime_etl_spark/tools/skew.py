"""Join/aggregation-key skew diagnosis.

Before a 100 TB join, the question is always "how hot is the hottest
key?" — AQE's skew-join split handles moderate cases at runtime, but a
pathological key (the NULL surrogate, the default tenant, the empty
string) wants an explicit decision: salt it (`analytics.salted_join`),
filter it, or handle it out-of-band. This tool turns that from folklore
into one aggregate:

    report = skew_report(df, ["customer_id"])   # one groupBy + top-k

Plan shape: ONE hash aggregate on the key (map-side combined) feeding a
TakeOrdered top-k plus a tiny stats reduce — the same cost as the
cheapest possible answer to the question. No collect beyond the k+1
result rows.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lime_etl_spark.plans import auto_broadcast


def key_histogram(df: DataFrame, keys: Sequence[str], top_k: int = 20) -> DataFrame:
    """Top-k heaviest key values: (key..., n_rows, share). One groupBy
    + TakeOrdered — never a global sort."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("bigint").alias("__total"))
    return (
        counts.crossJoin(auto_broadcast(total, bounded=True))  # 1-row total
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top_k)
    )


@dataclass(frozen=True)
class SkewStats:
    n_rows: int
    n_keys: int
    max_key_rows: int
    mean_key_rows: float
    skew_factor: float  # max / mean — 1.0 is perfectly uniform

    def recommended_salt(self, target_rows_per_task: int = 1_000_000) -> int:
        """Salt replication factor that caps the hottest key's rows per
        reducer at ``target_rows_per_task`` (1 = no salting needed)."""
        return max(1, math.ceil(self.max_key_rows / target_rows_per_task))


def skew_stats(df: DataFrame, keys: Sequence[str]) -> SkewStats:
    """Scalar skew summary — one groupBy + one 4-value reduce."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return _stats_of(counts)


def _stats_of(counts: DataFrame) -> SkewStats:
    row = counts.agg(
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("keys"),
        F.max("n").alias("mx"),
    ).collect()[0]
    n_rows = int(row["rows"] or 0)
    n_keys = int(row["keys"] or 0)
    mx = int(row["mx"] or 0)
    mean = n_rows / n_keys if n_keys else 0.0
    return SkewStats(
        n_rows=n_rows,
        n_keys=n_keys,
        max_key_rows=mx,
        mean_key_rows=mean,
        skew_factor=(mx / mean) if mean else 0.0,
    )


def skew_report(
    df: DataFrame, keys: Sequence[str], top_k: int = 20
) -> tuple[SkewStats, list]:
    """Stats + top-k histogram from ONE key aggregate — the API the
    module docstring promises (it used to reference a function that
    didn't exist, and the CLI paid two full fact-table scans, one per
    half of the answer). The counts table (one row per key) is
    persisted across the two small reduces and released before
    returning; the histogram comes back as collected Rows (≤ top_k of
    them) with ``share`` derived from the stats total — no second
    scan, no crossJoin.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    counts = counts.persist()
    try:
        stats = _stats_of(counts)
        top = (
            counts.orderBy(F.col("n").desc(), *keys)
            .limit(top_k)
            .withColumnRenamed("n", "n_rows")
            .withColumn(
                "share",
                F.round(F.col("n_rows") / F.lit(max(stats.n_rows, 1)), 6),
            )
            .collect()
        )
    finally:
        counts.unpersist()
    return stats, top
