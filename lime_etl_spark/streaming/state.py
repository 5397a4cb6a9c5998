"""Shared helpers for foreachBatch state tables (scd2/funnel/dedup).

Each incremental maintainer keeps its state as batch-partitioned
parquet (dynamic partition overwrite per micro-batch — the replay
idempotency design documented in streaming/scd2.py); these helpers hold
the pieces every maintainer needs identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_state_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """State read that tolerates the first-ever batch (no state yet).

    Local-FS existence check; on a cluster the state dirs are created
    once at pipeline setup and this branch never fires (and for object
    stores os.path.isdir is wrong anyway — create the dirs up front).
    """
    if os.path.isdir(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)
