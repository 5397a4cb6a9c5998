"""Sinks (SURVEY.md §2.2).

The reference's load path is: CSV into a StringIO → boto3 PUT to S3 →
Redshift DELETE window + CREATE TABLE IF NOT EXISTS + COPY FROM s3
(/root/reference/lime_survey_nps.py:82-151). In Spark those five steps
collapse into writers:

- ``write_csv`` — header CSV straight to any URI (s3a:// on a cluster);
  no in-memory buffer, no separate upload step (K2+K3).
- ``write_json_raw`` — raw-zone landing (K1).
- ``write_parquet`` — the engine's native warehouse zone, partitioned.
- ``idempotent_reload`` — the DELETE-window + append pattern (K4-K6)
  as a parquet-partition overwrite (``replaceWhere`` semantics via
  dynamic partition overwrite), or via JDBC preactions when a JDBC URL
  is configured.

Scale notes: writers inherit the upstream plan's partitioning;
``write_parquet`` exposes ``partition_by`` so downstream reads get
partition pruning (the reference's filename-date munging,
lime_survey_nps.py:78, becomes real partition columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lime_etl_spark.plans import auto_broadcast


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """Header CSV (K2/K3 parity). ``single_file`` coalesces to 1 part —
    only for small parity exports; never at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_json_raw(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Raw-zone landing (K1 parity, lime_survey_nps.py:45-46)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC writer — interchange with Hive-ecosystem consumers; same
    partition-pruning layout options as write_parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_parquet_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping write: range-repartition on the cluster keys and
    sort within partitions, so every output file covers a NARROW,
    mostly disjoint key range and parquet row-group min/max statistics
    actually prune.

    At 100 TB this is the difference between a range predicate reading
    one file and reading all of them: an unclustered write scatters
    every key across every file (min/max spans the whole domain, no
    file is ever skipped). Range partitioning costs one skew-aware
    sampled shuffle at write time — paid once, repaid on every
    downstream scan. Combine with ``partition_by`` (coarse pruning by
    directory) for two-level skipping.
    """
    keys = [df[c] for c in cluster_by]
    out = (
        df.repartitionByRange(n_files, *keys)
        if n_files is not None
        else df.repartitionByRange(*keys)
    )
    out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-column data-skipping write: cluster files by a Z-order
    (Morton) key over ``cluster_by`` (integer-valued SQL expressions).

    Single-key range clustering (write_parquet_clustered) makes ONE
    column's per-file min/max ranges narrow and leaves every other
    column spanning the whole domain in every file — predicates on the
    second column prune nothing. Interleaving the columns' bucket bits
    keeps each dimension locally compact, so parquet min/max stats
    prune scans filtered on ANY clustered column. Cost model is the
    same single sampled range shuffle at write time; the key is pure
    JVM bit math (ops/analytics.zorder_key), no UDF.

    The min/max needed for bucket scaling come from one scalar
    aggregate broadcast back over the data — at 100 TB that is one
    cheap pre-pass, or supply known domain bounds upstream.
    """
    from lime_etl_spark.ops.analytics import zorder_bucket, zorder_key

    if not cluster_by:
        raise ValueError("write_parquet_zordered needs at least one cluster_by column")
    if len(cluster_by) * bits > 63:
        raise ValueError(
            f"z-order key needs {len(cluster_by)} cols x {bits} bits = "
            f"{len(cluster_by) * bits} bits but at most 63 fit a signed long; "
            f"lower bits to <= {63 // len(cluster_by)} "
            f"(e.g. bits={63 // len(cluster_by)}) or cluster fewer columns"
        )
    aggs = []
    for i, c in enumerate(cluster_by):
        aggs.append(F.expr(f"min({c})").alias(f"__lo_{i}"))
        aggs.append(F.expr(f"max({c})").alias(f"__hi_{i}"))
    stats = df.agg(*aggs)
    buckets = [
        zorder_bucket(c, f"__lo_{i}", f"__hi_{i}", bits)
        for i, c in enumerate(cluster_by)
    ]
    keyed = df.crossJoin(auto_broadcast(stats, bounded=True)).withColumn(  # 1 row
        "__z", zorder_key(buckets, bits)
    )
    out = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files is not None
        else keyed.repartitionByRange("__z")
    )
    # projection after the sort is narrow: partitioning and in-file
    # order survive dropping the helper columns
    out = out.sortWithinPartitions("__z").select(*df.columns)
    out.write.mode(mode).parquet(path)


def idempotent_reload(
    df: DataFrame,
    path: str,
    partition_column: str,
) -> None:
    """Idempotent delete+load, the K4-K6 pattern re-expressed.

    Reference: ``DELETE FROM t WHERE start_date >= '2018-01-01'`` then
    COPY (lime_survey_nps.py:109-151) — a full reload in disguise since
    the cutoff predates all data. Engine version: dynamic partition
    overwrite — only the partitions present in ``df`` are replaced, which
    IS the delete-window semantics, done atomically per partition and
    safe to re-run after failure (same guarantee the reference's
    DELETE+COPY provides, without the cross-system transaction risk).
    On object stores the per-partition swap is NOT atomic (rename =
    copy+delete); the operative guarantee there is re-run convergence —
    a torn partition (subset of part files + dead-attempt strays) is
    pinned to converge to the clean state on re-run
    (tests/test_objectstore_sim.py), and job-level atomicity needs the
    S3A/magic committer (DEPLOYMENT.md round-6).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_column)
        .parquet(path)
    )
    # drop any cached listing/plan state for the path: the streaming
    # maintainers READ their state dirs again in the same and subsequent
    # micro-batches (prior-decision guards, survivor joins), and a stale
    # session-shared file-status entry from before this overwrite serves
    # part-file names the commit just replaced — FAILED_READ_FILE /
    # partition-schema assertion, surfaced by the round-8 prior-ids
    # guard in streaming/dedup.py
    df.sparkSession.catalog.refreshByPath(path)


def _partition_dir_columns(hfs, path: str) -> "list[str]":
    """Hive-style partition columns of a parquet directory, read off
    the ``col=value`` subdirectory chain (one representative branch —
    Spark writes a uniform chain). Empty list for unpartitioned dirs."""
    cols: list[str] = []
    cur = path
    while True:
        nxt = None
        for st in hfs.fs.listStatus(hfs._path_cls(cur)):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name and not name.startswith(("_", ".")):
                nxt = (name.split("=", 1)[0], st.getPath().toString())
                break
        if nxt is None:
            return cols
        cols.append(nxt[0])
        cur = nxt[1]


def compact_parquet(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Small-files maintenance: rewrite a parquet directory into
    ~``target_bytes`` files. Returns the new file count.

    Streaming sinks and per-batch partition overwrites accumulate
    small files; at scale the resulting task-per-file scheduling and
    footer overhead dominate reads. Compaction = one job: read,
    repartition to ceil(bytes/target) (range-clustered when
    ``cluster_by`` is given, so compaction also restores data-skipping
    locality), write to a temp sibling, swap. All filesystem work goes
    through the Hadoop FileSystem of ``path`` (round 6 — the
    os.walk/shutil form silently worked only on local paths, the same
    local-only defect class the r5 review caught in manifest IO), so
    hdfs://, s3a:// and file:// all take the same code path.

    The swap (delete old dir, rename tmp over it) is NOT atomic even
    on HDFS — a reader racing the swap can see the directory missing,
    and a crash between delete and rename leaves only the ``tmp``
    sibling (data intact, re-runnable: compact again or rename by
    hand). On object stores the rename itself is copy+delete. For a
    zero-downtime flip at scale, compact into a NEW prefix and flip
    the reader's pointer instead of swapping in place — this helper is
    the maintenance-window form.
    """
    import math

    from lime_etl_spark.io.fsutil import HadoopFS

    hfs = HadoopFS(spark, path)
    jpath = hfs._path_cls(path)
    total = 0
    it = hfs.fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    n_files = max(1, math.ceil(total / target_bytes))
    # Preserve Hive-style partition layout: the naive read+rewrite
    # materializes partition values as data columns and writes them
    # into ROOT-level files, silently flattening the directory scheme —
    # after which a replayed micro-batch's dynamic partition overwrite
    # (idempotent_reload deletes only path/col=N dirs) leaves the old
    # rows alive in the root files: duplicated state. Partition columns
    # are detected from the col=value directory chain and re-applied.
    part_cols = _partition_dir_columns(hfs, path)
    if part_cols and cluster_by:
        raise ValueError(
            f"compact_parquet: {path} is partitioned by {part_cols}; "
            "cluster_by within partition dirs is not supported — "
            "compact without cluster_by, or compact each partition dir"
        )
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    if cluster_by:
        write_parquet_clustered(df, tmp, cluster_by, n_files=n_files)
    elif part_cols:
        (
            df.repartition(n_files, *part_cols)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # Hadoop FileSystem reports most delete/rename failures through the
    # BOOLEAN return, not an exception — ignoring it here could strand
    # the dataset (old dir gone, compacted data stuck at the tmp name)
    # while reporting success
    if not hfs.fs.delete(jpath, True):
        raise IOError(
            f"compact_parquet: delete of {path} returned false (a "
            f"concurrent writer?); compacted data is intact at {tmp}"
        )
    if not hfs.fs.rename(hfs._path_cls(tmp), jpath):  # directory move
        raise IOError(
            f"compact_parquet: rename {tmp} -> {path} returned false; "
            f"the original was deleted — recover by renaming {tmp} "
            "into place (the compacted data is complete there)"
        )
    return n_files


def write_jdbc_idempotent(
    df: DataFrame,
    url: str,
    table: str,
    delete_predicate: str,
    create_ddl: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC variant of K4-K6 for warehouse targets (gated: needs a JDBC
    driver jar on the cluster; not exercised in the offline test env).

    Runs DELETE + optional CREATE TABLE IF NOT EXISTS via a driver-side
    connection, then appends with df.write.jdbc — exactly the reference's
    transaction order (lime_survey_nps.py:109-151).
    """
    props = properties or {}
    jvm_props = df.sparkSession._jvm.java.util.Properties()  # type: ignore[attr-defined]
    for k, v in props.items():
        jvm_props.setProperty(k, v)
    conn = df.sparkSession._jvm.java.sql.DriverManager.getConnection(url, jvm_props)  # type: ignore[attr-defined]
    try:
        stmt = conn.createStatement()
        if create_ddl:
            stmt.execute(create_ddl)
        stmt.execute(f"DELETE FROM {table} WHERE {delete_predicate}")
        stmt.close()
    finally:
        conn.close()
    df.write.jdbc(url, table, mode="append", properties=props)
