"""Shared helpers for foreachBatch state tables (scd2/funnel/dedup).

Each incremental maintainer keeps its state as batch-partitioned
parquet (dynamic partition overwrite per micro-batch — the replay
idempotency design documented in streaming/scd2.py); these helpers hold
the pieces every maintainer needs identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """State read that tolerates the first-ever batch (no state yet).

    Existence goes through the Hadoop FileSystem API, so any scheme
    the cluster can read (file://, hdfs://, s3a://) answers correctly.
    The old os.path.isdir probe was False for EVERY URI-scheme path —
    on exactly the object-store deployments the streaming maintainers
    target, every micro-batch silently read empty state and cross-batch
    dedup/scd2/funnel/quality state was thrown away (the docstring's
    'create the dirs up front' mitigation could not help: the probe
    ignored whether the directory existed).
    """
    from lime_etl_spark.io.fsutil import HadoopFS

    if HadoopFS(spark, path).exists(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)
