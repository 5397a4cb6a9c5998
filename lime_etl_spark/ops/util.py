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
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # Size the decision from the scan's input files — converting to an
    # RDD just to count partitions costs ~0.7 s of driver time per call.
    try:
        files = df.inputFiles()
        total = sum(
            os.path.getsize(urlparse(f).path) for f in files if f.startswith("file:")
        )
        max_bytes = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")).rstrip(
                "b"
            )
        )
        if files and total >= max_bytes * target:
            return df  # big enough to split naturally
    except Exception:
        pass  # non-file sources: fall through to the conservative spread
    return df.repartition(target)


def cleanup_dir_at_exit(path: str) -> None:
    """Register ``path`` for recursive removal at interpreter exit.

    For batchlike streaming runners that must return a LAZY DataFrame
    over freshly written state parquet: the state cannot be deleted
    before the caller collects, so deletion is deferred to atexit —
    bounded leak within a process instead of an unbounded one across
    processes."""
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)


def package_root() -> str:
    """Directory CONTAINING the lime_etl_spark package — the path
    executors and subprocess runners need on PYTHONPATH so their
    python workers can import the package regardless of how the
    driver found it. One definition (r5 review: this expression was
    duplicated across five tool/test call sites, each a silent drift
    risk if the install layout ever changes)."""
    import os

    import lime_etl_spark

    return os.path.dirname(os.path.dirname(os.path.abspath(lime_etl_spark.__file__)))
