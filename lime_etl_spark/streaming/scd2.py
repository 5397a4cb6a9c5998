"""Incremental SCD Type-2 maintenance over a change stream (CDC apply).

Batch SCD2 (ops/behavior.scd2_from_change_stream) rebuilds the full
history from the full change stream; a warehouse ingest pipeline needs
the online form: change events arrive continuously and the dimension
history must stay current without re-reading the corpus. Spark has no
MERGE on plain parquet, so the classic "close the old version's
valid_to, insert the new one" upsert — which would rewrite rows written
by EARLIER batches and break their replay idempotency — is re-designed
append-only:

1. The stored state is the CHANGE-POINT log: (key, state, valid_from,
   tiebreak), partitioned by ``ingest_batch``. Writes are dynamic
   partition overwrites keyed on the micro-batch id
   (io/sinks.idempotent_reload) — a replayed batch rewrites its own
   partition, never touches another batch's rows. No row is ever
   updated in place.
2. ``valid_to`` / ``version`` / ``is_current`` are RESOLVED AT READ
   TIME (``history()``): one lead/row_number window pass over the
   change-points, partitioned by key — the same math as the batch
   operator, so stream-maintained and batch-rebuilt histories are
   value-identical (tested).
3. Per micro-batch, dedup against the current state reuses the batch
   collapse itself: union [each affected key's LATEST stored
   change-point] + [the batch rows], run the same lag-based collapse,
   keep only surviving batch rows. A no-op update (state equal to the
   key's current state) therefore opens no version, across batch
   boundaries, by construction.
4. Late data: a batch row with ts <= the key's high-water mark (the
   max event time ever observed for the key, INCLUDING collapsed no-op
   updates that stored no change-point) cannot be applied append-only;
   such rows land in a ``quarantine`` partition with the conflict
   bound attached — loud, replayable, and the documented contract is
   the usual CDC one (per-key monotone event time across batches).
   The high-water mark is persisted per batch in an ``hwm`` sidecar
   (same design as streaming/funnel.py's ``__hwm``): comparing against
   the latest STORED change-point alone would silently accept an event
   whose ts falls between the current valid_from and the true max-seen
   ts after a collapsed no-op advanced observed time (round-3 review
   finding), and the maintained history would diverge from the batch
   rebuild. Upgrade note: state dirs written before the sidecar
   existed keep the weaker valid_from-only guard until their keys are
   next touched (greatest() coalesces), and their QUARANTINE
   partitions carry the old ``conflicts_with_valid_from`` column name
   — read a mixed-era quarantine dir with ``mergeSchema=true``.

Scale posture: the state read is pruned to the batch's keys
(left_semi on the batch key set) before the latest-change-point window
runs, so per-batch cost is bounded by batch size × per-key history
depth, not corpus size; at deployment the change-point log is
additionally partitioned/bucketed by key range so the semi join prunes
files. The read-side window is one exchange on the key — linear, and
only run by consumers that need intervals (point-in-time joins read
``history()``; downstream appends read nothing).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lime_etl_spark.io import sinks
from lime_etl_spark.streaming.state import read_state_or_empty as _read_or_empty

CHANGES_SUBDIR = "changes"
QUARANTINE_SUBDIR = "quarantine"
HWM_SUBDIR = "hwm"


def _schema(key_col: str, state_col: str, ts_col: str, tiebreak_col: str) -> str:
    return (
        f"{key_col} bigint, {state_col} string, {ts_col} timestamp, "
        f"{tiebreak_col} bigint, ingest_batch bigint"
    )


def _hwm_schema(key_col: str) -> str:
    return f"{key_col} bigint, __hwm timestamp, ingest_batch bigint"


def plan_batch(
    batch: DataFrame,
    stored: DataFrame,
    batch_id: int,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    stored_hwm: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pure dataflow of one micro-batch: (surviving change-points,
    quarantined late rows, updated per-key high-water marks), all lazy
    — process_batch writes them, and the plan-shape tests audit them
    without running a stream. ``stored_hwm`` is the hwm sidecar
    (``_hwm_schema``); None means no sidecar exists yet, in which case
    the guard degrades to the latest stored change-point's valid_from
    (the pre-round-4 behavior, also the upgrade path for state written
    before the sidecar existed)."""
    cols = [key_col, state_col, ts_col, tiebreak_col]
    new = batch.select(*cols)
    keys = new.select(key_col).distinct()

    # prune state to the batch's keys, then keep each key's latest
    # change-point. Only batches BEFORE this one count: micro-batch ids
    # are monotone, so this makes every batch a pure function of its
    # predecessors — a replay of ANY batch (not just the newest, which
    # is all Structured Streaming's checkpoint can re-run) rewrites its
    # partition with identical rows.
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    current = (
        stored.filter(F.col("ingest_batch") < batch_id)
        .join(keys, key_col, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )

    # per-key quarantine bound = high-water mark: max event time ever
    # OBSERVED, including collapsed no-ops that stored no change-point.
    # Latest sidecar row per key (pruned to the batch's keys, batches
    # before this one only — replay purity, same as `current`), then
    # greatest() with the current valid_from so legacy state without a
    # sidecar still gets the old (weaker) guard.
    if stored_hwm is None:
        stored_hwm = batch.sparkSession.createDataFrame([], _hwm_schema(key_col))
    wh = Window.partitionBy(key_col).orderBy(F.col("ingest_batch").desc())
    hwm_cur = (
        stored_hwm.filter(F.col("ingest_batch") < batch_id)
        .join(keys, key_col, "left_semi")
        .withColumn("__rn", F.row_number().over(wh))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__hwm")
    )
    bound = (
        current.select(key_col, F.col(ts_col).alias("__cur_from"))
        .join(hwm_cur, key_col, "full_outer")
        # greatest() skips NULLs: either side alone is a valid bound
        .select(key_col, F.greatest("__hwm", "__cur_from").alias("__bound"))
    )

    # late data: can't be applied append-only — quarantine, loudly
    flagged = new.join(bound, key_col, "left")
    late = flagged.filter(
        F.col("__bound").isNotNull() & (F.col(ts_col) <= F.col("__bound"))
    )
    ontime = flagged.filter(
        F.col("__bound").isNull() | (F.col(ts_col) > F.col("__bound"))
    ).select(*cols)

    # collapse = the batch operator's own rule over [current ⊎ batch]:
    # a row survives iff its state differs from its predecessor in
    # (ts, tiebreak) order; seeding with the current change-point makes
    # cross-batch no-op updates vanish by construction
    seeded = current.withColumn("__seed", F.lit(True)).unionByName(
        ontime.withColumn("__seed", F.lit(False))
    )
    worder = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # same null-safe transition rule as the batch operator (see
    # ops/behavior.scd2_from_change_stream): first-row marker + <=>
    surviving = (
        seeded.withColumn("__first", F.lag(F.lit(1)).over(worder).isNull())
        .withColumn("__prev", F.lag(state_col).over(worder))
        .filter(
            F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(state_col))
        )
        .filter(~F.col("__seed"))
        .select(*cols)
    )
    quarantined = late.select(
        *cols, F.col("__bound").alias("conflicts_with_hwm")
    )
    # hwm advance: max ontime ts per key, never regressing below the
    # prior bound (a fully-quarantined key emits no row at all — its
    # prior sidecar row stays latest, mirroring funnel.py's guarantee)
    hwm_out = (
        ontime.groupBy(key_col)
        .agg(F.max(ts_col).alias("__bmax"))
        .join(bound, key_col, "left")
        .select(key_col, F.greatest("__bmax", "__bound").alias("__hwm"))
    )
    return surviving, quarantined, hwm_out


def process_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> None:
    """Apply one micro-batch of change events — see module docstring.

    Deterministic function of (stored change-points, batch); both
    writes are partition overwrites keyed on ``batch_id``, so replays
    converge to the same state.
    """
    spark = batch.sparkSession
    schema = _schema(key_col, state_col, ts_col, tiebreak_col)
    stored = _read_or_empty(spark, os.path.join(state_dir, CHANGES_SUBDIR), schema)
    stored_hwm = _read_or_empty(
        spark, os.path.join(state_dir, HWM_SUBDIR), _hwm_schema(key_col)
    )
    surviving, quarantined, hwm_out = plan_batch(
        batch, stored, batch_id, key_col, state_col, ts_col, tiebreak_col,
        stored_hwm=stored_hwm,
    )

    sinks.idempotent_reload(
        surviving.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, CHANGES_SUBDIR),
        "ingest_batch",
    )
    sinks.idempotent_reload(
        quarantined.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, QUARANTINE_SUBDIR),
        "ingest_batch",
    )
    sinks.idempotent_reload(
        hwm_out.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, HWM_SUBDIR),
        "ingest_batch",
    )


def history(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Resolve the stored change-points into the full SCD2 history —
    (key, state, valid_from, valid_to, version, is_current). Delegates
    to ops/behavior.scd2_from_change_stream: stored change-points
    already have pairwise-distinct consecutive states, so its collapse
    is a no-op and the resolve math lives in exactly one place."""
    from lime_etl_spark.ops import behavior

    schema = _schema(key_col, state_col, ts_col, tiebreak_col)
    changes = _read_or_empty(
        spark, os.path.join(state_dir, CHANGES_SUBDIR), schema
    )
    return behavior.scd2_from_change_stream(
        changes, key_col, state_col, ts_col, tiebreak_col
    )


def maintain_scd2(
    changes_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **cols,
) -> StreamingQuery:
    """Attach incremental SCD2 maintenance to a change-event stream."""
    writer = changes_stream.writeStream.foreachBatch(
        lambda df, bid: process_batch(df, bid, state_dir, **cols)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_scd2_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_scd2_history body: drain the events fixture
    through the maintainer in ONE availableNow batch (fresh state per
    call) and return the resolved history. Stream-maintained state
    equals the batch rebuild, so this streaming operator carries the
    SAME full value oracle as scd2_user_state_history.

    max_files_per_trigger=None is load-bearing: the fixture is a table
    SNAPSHOT whose part files are not time-ordered, so a multi-file
    drain split across micro-batches would violate the maintainer's
    per-key monotone-time contract and mass-quarantine later batches
    (regression-tested in test_streaming_scd2.py). Genuinely ordered
    multi-batch CDC feeds are the tested multi-batch path."""
    import tempfile
    import uuid

    from lime_etl_spark.ops.util import cleanup_dir_at_exit
    from lime_etl_spark.streaming.events import read_events_stream, stage_events_dir

    work = tempfile.mkdtemp(prefix=f"lime_scd2_{uuid.uuid4().hex[:8]}_")
    cleanup_dir_at_exit(work)
    state = os.path.join(work, "state")
    ck = os.path.join(work, "ck")
    q = maintain_scd2(
        read_events_stream(spark, stage_events_dir(sf_dir), max_files_per_trigger=None),
        state,
        ck,
    )
    q.awaitTermination()
    return history(spark, state)
