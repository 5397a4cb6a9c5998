"""Structured Streaming over the events stream (SURVEY.md §2.7).

The reference's "streaming" is a cron re-run of a batch script; here the
events table gets real incremental semantics:

- watermarked tumbling / sliding / session windows,
- dropDuplicatesWithinWatermark (streaming twin of core.dedup_latest's
  exact-key intent),
- a foreachBatch idempotent sink that reuses io.sinks.idempotent_reload
  — the reference's DELETE-window + COPY pattern
  (/root/reference/lime_survey_nps.py:109-151) becomes an exactly-once
  partition overwrite per micro-batch.

State-at-scale rules: every stateful op carries a watermark so state is
bounded (late data beyond the watermark is dropped, the reference had no
notion of late data); shuffle partitions for streaming stages follow the
session config; checkpoint dirs are caller-provided (durable storage on
a real cluster).

Tests drive these with trigger(availableNow=True) over the parquet
fixture — bounded input, so results equal the batch twins in
registry.py (that equality IS the oracle for streaming_tumbling_5min).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lime_etl_spark import schemas


def use_rocksdb_state_store(spark: SparkSession, enabled: bool = True) -> None:
    """Switch stateful operators to the RocksDB state store provider.

    The default HDFS-backed store keeps all state on the JVM heap —
    fine for bounded tests, a GC time-bomb for large keyspaces. RocksDB
    spills state off-heap/to disk with incremental checkpointing: the
    production setting for big stateful streaming (sessionization over
    millions of users). Runtime conf — takes effect for queries started
    afterwards.
    """
    key = "spark.sql.streaming.stateStore.providerClass"
    if enabled:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    else:
        spark.conf.unset(key)


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = 8,
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    ``max_files_per_trigger`` bounds micro-batch size in continuous
    runs; pass None to drop the bound so an availableNow drain takes
    the whole directory in ONE batch — required when draining a static
    TABLE SNAPSHOT (part files are not time-ordered, so multi-batch
    drains violate any consumer that assumes per-key monotone event
    time across batches, e.g. streaming/scd2.py's CDC contract). The
    explicit schema is mandatory for streaming sources.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # The fixture's ts encoding has varied across driver refreshes:
    # parquet TIMESTAMP(NANOS) (surfaces as nano-epoch long under
    # nanosAsLong — Spark has no nanos type) vs TIMESTAMP(MICROS).
    # Streaming sources need the schema up front, so probe it with a
    # footer-only batch read (no data scan) and pick the matching path,
    # exactly mirroring io.sources.read_table. mergeSchema=true makes
    # the probe see EVERY footer: a directory mixing both encodings
    # fails the merge (bigint vs timestamp) instead of silently reading
    # whichever subset matches the sampled file's schema — the stream
    # reader assumes one homogeneous encoding per directory.
    from pyspark.errors import AnalysisException

    try:
        ts_is_nanos = (
            dict(
                spark.read.option("mergeSchema", "true").parquet(events_dir).dtypes
            ).get("ts")
            == "bigint"
        )
    except AnalysisException as exc:
        if exc.getCondition() in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND"):
            # directory empty / not yet created at start-up (stream will
            # fill it): no footers to probe — assume the registered
            # schema (micros path)
            ts_is_nanos = False
        else:
            raise
    except Exception as exc:  # Py4J-wrapped JVM errors (not AnalysisException)
        if "CANNOT_MERGE_SCHEMAS" in str(exc):
            raise ValueError(
                f"events dir {events_dir} mixes parquet ts encodings "
                "(TIMESTAMP(NANOS) and TIMESTAMP(MICROS) files in one "
                "directory — e.g. a partial fixture regeneration while a "
                "stream runs). read_events_stream needs one homogeneous "
                "encoding per directory; rewrite the stragglers."
            ) from exc
        raise  # genuine probe failure (corrupt footer, permissions): loud
    if ts_is_nanos:
        nanos_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in schemas.EVENTS.fields
            ]
        )
        reader = spark.readStream.schema(nanos_schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.parquet(events_dir)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    reader = spark.readStream.schema(schemas.EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def tumbling_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-decimal sum → rounded double: bit-identical to the
            # batch twin and the DuckDB oracle (see registry docstring)
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select("event_type", F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows per user (gap-merged, watermark-bounded
    state) — streaming twin of registry.events_sessionized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal accumulation, not float: the oracle and the batch
            # twin both sum value::DECIMAL(12,2) — float order varies
            # with partitioning and a session landing on a half-cent
            # boundary rounds differently (tumbling_counts already
            # carried this fix; this path was left on float)
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INNER join with an event-time interval constraint:
    each purchase matched to every click by the same user in the
    preceding ``horizon``. The canonical attribution join.

    State stays bounded because BOTH sides carry a watermark AND the
    join condition range-bounds event time on both sides — Spark derives
    a state-eviction watermark per side from the interval, so at 100 TB
    the join state holds only ``horizon + watermark`` of history per
    key, not the whole stream. Append output mode (the only mode
    stream-stream inner joins support); on bounded availableNow input
    the emitted set equals the batch interval join, which is the
    oracle's definition.

    Left-outer mode ("leftOuter") additionally emits unmatched clicks
    with NULL purchase columns — but only once the watermark passes the
    click's match horizon (the stream must prove no purchase can still
    arrive), so outer results trail the watermark by design. Same state
    bound.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        F.expr(
            "user_id = p_user_id"
            " AND purchase_ts >= click_ts"
            f" AND purchase_ts <= click_ts + interval {horizon}"
        ),
        how,
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


def run_click_purchase_join_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_click_purchase_join body: stream the fixture
    twice (self-join of one source), availableNow, append mode.

    max_files_per_trigger=None is load-bearing (same reason as
    run_scd2_batchlike): a multi-part-file fixture is NOT time-ordered
    across files, and a stream-stream join is append-mode only — once
    batch 1 advances the watermark, batch 2's older clicks/purchases
    are evicted from join state and the join silently loses rows vs
    the batch interval-join oracle. One batch = no mid-drain watermark
    eviction."""
    src = stage_events_dir(sf_dir)
    clicks = read_events_stream(spark, src, max_files_per_trigger=None).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, src, max_files_per_trigger=None).filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_interval_join(clicks, purchases)
    return run_to_memory(joined, output_mode="append")


def run_to_memory(
    stream_df: DataFrame, checkpoint_dir: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan with availableNow → memory sink, return
    the materialized result. Bounded-input helper for tests/oracle."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    checkpoint = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"lime_ckpt_{name}"
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stage_events_dir(sf_dir: str) -> str:
    """The driver fixture is a single parquet file; the file stream
    source wants a directory. Stage a copy into a temp dir (tiny file;
    on a real deployment the source is already a directory of files).
    Generated rehearsal SFs (tools.datagen) already write
    ``events.parquet`` AS a directory of part files — use it directly,
    zero copies."""
    import shutil

    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        return src
    # key the cache by a hash of the ABSOLUTE path (two fixture roots
    # with the same basename must not collide and serve each other's
    # events), and refresh on any mtime difference, not only newer
    # (a regenerated fixture unpacked with preserved older timestamps
    # must not be served stale)
    key = hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:16]
    dest_dir = os.path.join(tempfile.gettempdir(), f"lime_events_{key}")
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, "events.parquet")
    if not os.path.exists(dest) or os.path.getmtime(dest) != os.path.getmtime(src):
        shutil.copyfile(src, dest)
        os.utime(dest, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns))
    return dest_dir


def run_tumbling_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_tumbling_5min body: stream the fixture with
    availableNow, return the final tumbling aggregation (== batch)."""
    events = read_events_stream(spark, stage_events_dir(sf_dir))
    return run_to_memory(tumbling_counts(events))


def run_foreach_batch_idempotent(
    stream_df: DataFrame,
    dest_path: str,
    partition_column: str,
    checkpoint_dir: str,
) -> None:
    """foreachBatch sink reusing the idempotent delete-window writer —
    re-running a failed micro-batch overwrites the same partitions
    instead of duplicating them (exactly-once on top of at-least-once).
    """
    from lime_etl_spark.io.sinks import idempotent_reload

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_reload(batch_df, dest_path, partition_column)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka connector jars are on the classpath.
    The container ships without them, so Kafka paths are gated exactly
    like the JDBC sink: real implementation, availability-checked."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka-source events stream: value is the JSON-serialized event
    row; parse with the canonical schema, event time from the payload
    ts (NOT the broker timestamp — late data must be judged on event
    time). Offsets/exactly-once come from the checkpoint as with any
    structured-streaming source.

    At scale: one Spark partition per Kafka partition; minPartitions
    can fan out hot topics. The parse is a JVM-side from_json — no
    Python in the stream path.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; gate calls with "
            "kafka_available() (rate-source fallback covers tests)"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schemas.EVENTS).alias("ev")
    )
    return parsed.select("ev.*")


def read_events_rate(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Rate-source fallback with the events schema — a broker-free
    continuous source for exercising non-file streaming paths (trigger
    cadence, watermark advance) in environments without Kafka. Values
    are deterministic functions of the rate source's monotonic counter."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    return rate.select(
        F.col("value").alias("event_id"),
        (F.col("value") % 150).cast("int").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ["click", "view", "purchase", "signup", "error"]]),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 997).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def write_events_kafka(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
) -> "StreamingQuery":
    """Kafka-sink write path: serialize each row to a JSON value with a
    partitioning key, exactly-once-per-checkpoint via the streaming
    commit log (Kafka's transactional producer is not used by Spark's
    sink — downstream consumers should dedup on a message key for
    end-to-end idempotence, the standard pattern).

    The key column keeps one entity's events in one Kafka partition
    (per-key ordering for consumers); the JSON serialization is
    JVM-side to_json — no Python in the stream path. Gated on connector
    availability exactly like the source.
    """
    if not kafka_available(stream_df.sparkSession):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; gate calls with "
            "kafka_available() (the payload-shaping transform is testable "
            "without a broker via kafka_payload())"
        )
    payload = kafka_payload(stream_df, key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def kafka_payload(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The broker-independent half of the Kafka sink: (key, value)
    columns Spark's kafka sink requires — key = partition key as
    string, value = JSON of the full row. Split out so the
    serialization contract is unit-testable without a connector."""
    cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
    )
