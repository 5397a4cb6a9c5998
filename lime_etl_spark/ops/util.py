"""Plan-shaping utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the plan is under-parallelized.

    Small single-row-group parquet files (this repo's fixtures; also the
    tail of any real lake) scan as ONE task, serializing every
    CPU-heavy expression downstream on a 32-core executor. When the
    current partition count is below cluster default parallelism,
    a cheap round-robin shuffle of the (small) input buys full-width
    execution of what follows.

    At 100 TB this is a NO-OP by construction: a large scan already has
    ≥ parallelism splits, and blindly repartitioning would shuffle the
    whole table — the condition makes the helper safe to leave in
    operator code paths.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
