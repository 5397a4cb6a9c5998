"""Incremental ordered-funnel maintenance over an event stream.

The batch funnel (ops/behavior.funnel) recomputes every user's chained
earliest-qualifying step times from the full event log; the online form
keeps them as per-user state and advances it per micro-batch — the
real-time conversion dashboard without an O(corpus) rescan.

Why this is EXACT and not an approximation: under the per-key monotone
event-time contract (events for a user arrive in timestamp order across
batches — the same CDC-style contract streaming/scd2.py documents), a
new event can never lower an already-set step time: step ``i`` is set
to the EARLIEST qualifying occurrence, and every later-arriving event
has a later timestamp. So the recurrence

    state' = step_times(state-as-pseudo-events ∪ batch events)

reproduces the batch computation over the full history: the stored
(t1..tk) vector, replayed as one synthetic event per set step, drives
ops/behavior._step_times to the identical chain (proved by the
equivalence tests). Events that violate the contract (ts <= the user's
high-water mark) are quarantined loudly; scd2 persists the identical
per-key ``__hwm`` guard in its ``hwm`` sidecar.

State model (same idempotency design as streaming/scd2.py):
- one row per (user, batch): the step-time vector + high-water mark,
  partitioned by ``ingest_batch`` — dynamic partition overwrite keyed
  on the batch id, so any batch replay converges;
- the CURRENT state is each user's row from the latest batch < now —
  resolved with one row_number window at read time;
- per-batch cost: state pruned to the batch's users (left_semi), then
  one user-key exchange for the chained window mins — independent of
  corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lime_etl_spark.io import sinks
from lime_etl_spark.ops import behavior
from lime_etl_spark.streaming.state import read_state_or_empty as _read_or_empty

STATE_SUBDIR = "funnel_state"
QUARANTINE_SUBDIR = "quarantine"


def _state_schema(steps) -> str:
    if not steps:
        # the batch funnel raises the same way at attach time; without
        # this the empty join produced malformed DDL ('user_id bigint,
        # , __hwm ...') that died in the schema parser mid-stream
        raise ValueError("funnel needs at least one step")
    cols = ", ".join(f"__t{i} timestamp" for i in range(len(steps)))
    return f"user_id bigint, {cols}, __hwm timestamp, ingest_batch bigint"


def current_state(
    spark: SparkSession,
    state_dir: str,
    steps,
    before_batch: int | None = None,
    users: DataFrame | None = None,
) -> DataFrame:
    """Latest per-user step-time vector (one row_number window).
    ``users`` semi-joins BEFORE the window so a per-batch read costs
    O(batch users' history), not O(all users)."""
    stored = _read_or_empty(
        spark, os.path.join(state_dir, STATE_SUBDIR), _state_schema(steps)
    )
    if before_batch is not None:
        stored = stored.filter(F.col("ingest_batch") < before_batch)
    if users is not None:
        stored = stored.join(users, "user_id", "left_semi")
    w = Window.partitionBy("user_id").orderBy(F.col("ingest_batch").desc())
    return (
        stored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "ingest_batch")
    )


def process_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    steps,
    window_days: int | None = None,
) -> None:
    """Advance the funnel state by one micro-batch (see module doc)."""
    spark = batch.sparkSession
    new = batch.select("user_id", "event_type", "ts", "event_id")
    state = current_state(
        spark,
        state_dir,
        steps,
        before_batch=batch_id,
        users=new.select("user_id").distinct(),
    )

    # contract guard: per-user monotone event time across batches
    bound = state.select("user_id", "__hwm")
    flagged = new.join(bound, "user_id", "left")
    late = flagged.filter(F.col("__hwm").isNotNull() & (F.col("ts") <= F.col("__hwm")))
    ontime = flagged.filter(
        F.col("__hwm").isNull() | (F.col("ts") > F.col("__hwm"))
    ).select("user_id", "event_type", "ts", "event_id")

    # state-as-pseudo-events: one synthetic event per SET step replays
    # the stored chain through the same _step_times the batch op uses
    pseudo = state.select(
        "user_id",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("event_type"),
                            F.col(f"__t{i}").alias("ts"),
                        )
                        for i, s in enumerate(steps)
                    ]
                ),
                lambda e: e["ts"].isNotNull(),
            )
        ).alias("e"),
    ).select(
        "user_id", "e.event_type", "e.ts", F.lit(-1).cast("long").alias("event_id")
    )
    union = ontime.unionByName(pseudo)
    per_user, step_cols = behavior._step_times(
        union, steps, "user_id", "ts", "event_type", window_days
    )
    # high-water mark must NEVER regress: the stored hwm can exceed
    # every retained timestamp (a non-qualifying event advances it but
    # is not kept as state), and recomputing from union alone would
    # lower it whenever a batch is fully quarantined — after which a
    # contract-violating late event would be wrongly ACCEPTED and the
    # stream would diverge from the batch funnel (caught by review
    # repro; pinned in test_hwm_never_regresses_on_quarantined_batch)
    batch_hwm = union.groupBy("user_id").agg(F.max("ts").alias("__bhwm"))
    hwm = (
        batch_hwm.join(bound, "user_id", "left")
        .select(
            "user_id",
            # greatest() skips NULLs (the same property scd2.py's
            # hwm bound relies on) — no coalesce needed
            F.greatest(F.col("__bhwm"), F.col("__hwm")).alias("__hwm"),
        )
    )
    out = per_user.join(hwm, "user_id").select(
        "user_id", *step_cols, "__hwm"
    )
    sinks.idempotent_reload(
        out.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, STATE_SUBDIR),
        "ingest_batch",
    )
    sinks.idempotent_reload(
        late.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, QUARANTINE_SUBDIR),
        "ingest_batch",
    )


def funnel_report(spark: SparkSession, state_dir: str, steps) -> DataFrame:
    """(step_idx, step, n_users, pct_of_first, pct_of_prev) from the
    maintained state — delegates to the batch op's report builder, so
    shape and rate semantics live in exactly one place."""
    state = current_state(spark, state_dir, steps)
    return behavior.report_from_step_times(
        state, steps, [f"__t{i}" for i in range(len(steps))]
    )


def maintain_funnel(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    steps,
    window_days: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach incremental funnel maintenance to an event stream."""
    writer = events_stream.writeStream.foreachBatch(
        lambda df, bid: process_batch(df, bid, state_dir, steps, window_days)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_funnel_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_funnel body: drain the events fixture in ONE
    availableNow batch (snapshot semantics — see streaming/scd2.py's
    identical note) and return the report; equals the batch funnel, so
    it carries the same full value oracle."""
    import tempfile
    import uuid

    from lime_etl_spark.ops.util import cleanup_dir_at_exit
    from lime_etl_spark.streaming.events import read_events_stream, stage_events_dir

    steps = ["signup", "view", "purchase"]
    work = tempfile.mkdtemp(prefix=f"lime_funnel_{uuid.uuid4().hex[:8]}_")
    cleanup_dir_at_exit(work)
    state = os.path.join(work, "state")
    ck = os.path.join(work, "ck")
    q = maintain_funnel(
        read_events_stream(spark, stage_events_dir(sf_dir), max_files_per_trigger=None),
        state,
        ck,
        steps,
        window_days=7,
    )
    q.awaitTermination()
    return funnel_report(spark, state, steps)
