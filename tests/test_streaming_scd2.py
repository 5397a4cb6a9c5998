"""Incremental SCD2 maintenance (streaming/scd2.py): multi-batch
equivalence with the batch operator, replay idempotency, cross-batch
no-op suppression, and late-data quarantine."""

from __future__ import annotations
import pytest

import os
from datetime import datetime

from pyspark.sql import functions as F

from lime_etl_spark.ops import behavior
from lime_etl_spark.streaming import scd2


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _hist_rows(spark, state):
    return sorted(
        tuple(r)
        for r in scd2.history(spark, state).collect()
    )


def test_multibatch_equals_batch_rebuild(spark, tmp_path):
    rows = [
        (1, "a", _ts(1)), (1, "a", _ts(2)), (1, "b", _ts(3)),
        (2, "x", _ts(1)),
        (1, "b", _ts(5)), (1, "c", _ts(6)),     # batch 2: no-op then change
        (2, "y", _ts(4)), (3, "z", _ts(4)),
    ]
    state = str(tmp_path / "state")
    scd2.process_batch(_df(spark, rows[:4]), 0, state)
    scd2.process_batch(_df(spark, rows[4:]), 1, state)
    # event_ids differ between the incremental frames (enumerate
    # restarts) and the full frame — compare on (user, state, bounds)
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in scd2.history(spark, state).collect()
    )
    want = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in behavior.scd2_from_change_stream(
            _df(spark, rows), "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert got == want


def test_crossbatch_noop_update_opens_no_version(spark, tmp_path):
    state = str(tmp_path / "state")
    scd2.process_batch(_df(spark, [(1, "a", _ts(1))]), 0, state)
    scd2.process_batch(_df(spark, [(1, "a", _ts(5))]), 1, state)
    hist = scd2.history(spark, state).collect()
    assert len(hist) == 1 and hist[0]["state"] == "a"
    assert hist[0]["is_current"]


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _df(spark, [(1, "a", _ts(1)), (2, "x", _ts(1))])
    b1 = _df(spark, [(1, "b", _ts(3)), (2, "x", _ts(3))])  # 2:x is no-op
    scd2.process_batch(b0, 0, state)
    scd2.process_batch(b1, 1, state)
    before = _hist_rows(spark, state)
    scd2.process_batch(b1, 1, state)  # replay after "sink commit lost"
    assert _hist_rows(spark, state) == before
    scd2.process_batch(b0, 0, state)  # replay of the OLDER batch too
    assert _hist_rows(spark, state) == before


def test_late_rows_quarantined_not_applied(spark, tmp_path):
    state = str(tmp_path / "state")
    scd2.process_batch(_df(spark, [(1, "a", _ts(5))]), 0, state)
    scd2.process_batch(
        _df(spark, [(1, "b", _ts(2)), (1, "c", _ts(7))]), 1, state
    )
    hist = scd2.history(spark, state).collect()
    assert sorted((r["state"], r["is_current"]) for r in hist) == [
        ("a", False), ("c", True)
    ]
    quar = spark.read.parquet(os.path.join(state, scd2.QUARANTINE_SUBDIR))
    q = quar.collect()
    assert len(q) == 1 and q[0]["event_type"] == "b"
    assert q[0]["conflicts_with_hwm"] == _ts(5)


@pytest.mark.slow
def test_collapsed_noop_advances_quarantine_bound(spark, tmp_path):
    """Round-3 ADVICE repro: a collapsed no-op update stores no change-
    point but DOES advance the key's observed event time. An event with
    ts between the current valid_from and the true max-seen ts must be
    quarantined (persisted __hwm sidecar), not silently applied — the
    old valid_from-only guard accepted it and the maintained history
    diverged from the batch rebuild (A@10, no-op A@20, B@15 → stream
    said A,B; batch rebuild of the full log says A alone survives to
    B@15's quarantine)."""
    state = str(tmp_path / "state")
    scd2.process_batch(_df(spark, [(1, "a", _ts(10))]), 0, state)
    # no-op: same state, later ts — opens no version, advances hwm
    scd2.process_batch(_df(spark, [(1, "a", _ts(20))]), 1, state)
    assert scd2.history(spark, state).count() == 1
    # contract violation: ts(15) is after valid_from(10) but before the
    # max-seen ts(20)
    scd2.process_batch(_df(spark, [(1, "b", _ts(15))]), 2, state)
    hist = scd2.history(spark, state).collect()
    assert [(r["state"], r["is_current"]) for r in hist] == [("a", True)]
    quar = spark.read.parquet(os.path.join(state, scd2.QUARANTINE_SUBDIR))
    q = quar.collect()
    assert len(q) == 1 and q[0]["event_type"] == "b"
    assert q[0]["conflicts_with_hwm"] == _ts(20)
    # hwm never regresses on a fully-quarantined batch: a second
    # violation below the bound still quarantines (mirrors the funnel's
    # test_hwm_never_regresses_on_quarantined_batch)
    scd2.process_batch(_df(spark, [(1, "b", _ts(18))]), 3, state)
    assert scd2.history(spark, state).count() == 1
    assert (
        spark.read.parquet(os.path.join(state, scd2.QUARANTINE_SUBDIR)).count()
        == 2
    )
    # and an on-time event after the hwm is applied normally
    scd2.process_batch(_df(spark, [(1, "b", _ts(25))]), 4, state)
    hist = sorted(
        (r["state"], r["is_current"])
        for r in scd2.history(spark, state).collect()
    )
    assert hist == [("a", False), ("b", True)]


def test_streamed_fixture_equals_batch_operator(spark, sf_dir):
    from lime_etl_spark.io.sources import read_table

    got = sorted(
        tuple(r) for r in scd2.run_scd2_batchlike(spark, sf_dir).collect()
    )
    ev = read_table(spark, sf_dir, "events")
    want = sorted(
        tuple(r)
        for r in behavior.scd2_from_change_stream(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert got == want


def test_batch_dataflow_no_cartesian_single_key_exchange(spark):
    """plan_batch's dataflow: every join is keyed on the SCD key (no
    cartesian/BNLJ), and the current-state window + collapse window +
    both joins all hash-partition on that one key."""
    batch = _df(spark, [(1, "a", _ts(1))])
    stored = spark.createDataFrame(
        [], scd2._schema("user_id", "event_type", "ts", "event_id")
    )
    hwm = spark.createDataFrame([], scd2._hwm_schema("user_id"))
    surviving, quarantined, hwm_out = scd2.plan_batch(
        batch, stored, 1, stored_hwm=hwm
    )
    for df in (surviving, quarantined, hwm_out):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        import re

        keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
        assert keys <= {"user_id"}, keys


def test_multifile_snapshot_drains_in_one_batch(spark, sf_dir, tmp_path):
    """Regression (review finding): a generated events dir has 16
    unordered part files; with the default maxFilesPerTrigger=8 the
    drain split into 2+ micro-batches whose time-interleaved rows mass-
    quarantined. The batchlike runner must take a snapshot in ONE batch
    and still equal the batch rebuild."""
    from lime_etl_spark.io.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    multi = str(tmp_path / "events.parquet")
    # 4 hash-scattered part files: consecutive event times land in
    # different files, the exact layout that broke multi-batch drains
    ev.repartition(4).write.parquet(multi)
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in scd2.run_scd2_batchlike(spark, str(tmp_path)).collect()
    )
    want = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in behavior.scd2_from_change_stream(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert got == want


def test_null_state_opens_and_closes_versions(spark, tmp_path):
    """A NULL state is a real state: A -> NULL -> A is three versions
    (null-safe transition rule), in both the batch operator and the
    incremental maintainer."""
    rows = [(1, "a", _ts(1)), (1, None, _ts(2)), (1, "a", _ts(3))]
    batch_hist = behavior.scd2_from_change_stream(
        _df(spark, rows), "user_id", "event_type", "ts", "event_id"
    ).orderBy("version").collect()
    assert [(r["state"], r["is_current"]) for r in batch_hist] == [
        ("a", False), (None, False), ("a", True)
    ]
    state = str(tmp_path / "state")
    scd2.process_batch(_df(spark, rows[:2]), 0, state)
    scd2.process_batch(_df(spark, rows[2:]), 1, state)
    inc = scd2.history(spark, state).orderBy("version").collect()
    assert [(r["state"], r["is_current"]) for r in inc] == [
        ("a", False), (None, False), ("a", True)
    ]
    # and a NULL -> NULL no-op across batches opens nothing
    scd2.process_batch(_df(spark, [(1, None, _ts(4))]), 2, state)
    scd2.process_batch(_df(spark, [(1, None, _ts(5))]), 3, state)
    assert scd2.history(spark, state).count() == 4


@pytest.mark.slow
def test_ordered_multibatch_cdc_at_fixture_scale(spark, sf_dir, tmp_path):
    """The REAL incremental path at fixture scale: the events table
    sliced into four time-ordered CDC batches (per-key monotone across
    batches, the documented contract) must reproduce the batch rebuild
    exactly — including cross-boundary no-op suppression — with zero
    quarantined rows."""
    import os

    from pyspark.sql import functions as F

    from lime_etl_spark.io.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    state = str(tmp_path / "state")
    for i in range(4):
        a = lo + span * i
        b = hi if i == 3 else lo + span * (i + 1)
        batch = ev.filter(
            (F.col("ts") >= a) & (F.col("ts") <= b if i == 3 else F.col("ts") < b)
        )
        scd2.process_batch(batch, i, state)
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in scd2.history(spark, state).collect()
    )
    want = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in behavior.scd2_from_change_stream(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert got == want
    # zero quarantined rows: an all-empty quarantine write leaves no
    # parquet part files (just _SUCCESS markers)
    import glob

    assert not glob.glob(
        os.path.join(state, scd2.QUARANTINE_SUBDIR, "**", "*.parquet"),
        recursive=True,
    )


@pytest.mark.slow
def test_crash_between_state_writes_converges_on_replay(spark, sf_dir, tmp_path):
    """process_batch performs THREE sequential partition-overwrite
    writes (changes, quarantine, hwm). A process dying between them
    leaves a batch partially applied — but the streaming checkpoint has
    not committed that batch, so it REPLAYS, and replay purity (every
    read filters ingest_batch < batch_id, every write overwrites its
    own batch partition) must converge the torn state to exactly the
    uninterrupted result. Simulates both realistic torn states: (a)
    changes written, quarantine+hwm missing; (b) changes+quarantine
    written, hwm missing."""
    import glob

    from lime_etl_spark.io import sinks
    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.streaming.state import read_state_or_empty

    ev = read_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    batches = []
    for i in range(4):
        a = lo + span * i
        b = hi if i == 3 else lo + span * (i + 1)
        batches.append(
            ev.filter(
                (F.col("ts") >= a)
                & (F.col("ts") <= b if i == 3 else F.col("ts") < b)
            )
        )

    clean = str(tmp_path / "clean")
    for i, b in enumerate(batches):
        scd2.process_batch(b, i, clean)

    def _state_rows(state):
        hist = _hist_rows(spark, state)
        quar = sorted(
            tuple(r)
            for r in read_state_or_empty(
                spark,
                os.path.join(state, scd2.QUARANTINE_SUBDIR),
                "user_id bigint, event_type string, ts timestamp, "
                "event_id bigint, conflicts_with_hwm timestamp, ingest_batch bigint",
            ).collect()
        )
        hwm = sorted(
            tuple(r)
            for r in read_state_or_empty(
                spark, os.path.join(state, scd2.HWM_SUBDIR), scd2._hwm_schema("user_id")
            ).collect()
        )
        return hist, quar, hwm

    for torn_writes in (1, 2):  # 1 = only changes landed; 2 = +quarantine
        state = str(tmp_path / f"torn{torn_writes}")
        scd2.process_batch(batches[0], 0, state)
        scd2.process_batch(batches[1], 1, state)
        # crash mid-batch-2: replicate process_batch's write sequence,
        # stopping after `torn_writes` of the three writes
        stored = read_state_or_empty(
            spark, os.path.join(state, scd2.CHANGES_SUBDIR),
            scd2._schema("user_id", "event_type", "ts", "event_id"),
        )
        stored_hwm = read_state_or_empty(
            spark, os.path.join(state, scd2.HWM_SUBDIR), scd2._hwm_schema("user_id")
        )
        surviving, quarantined, hwm_out = scd2.plan_batch(
            batches[2], stored, 2, stored_hwm=stored_hwm
        )
        sinks.idempotent_reload(
            surviving.withColumn("ingest_batch", F.lit(2)),
            os.path.join(state, scd2.CHANGES_SUBDIR), "ingest_batch",
        )
        if torn_writes == 2:
            sinks.idempotent_reload(
                quarantined.withColumn("ingest_batch", F.lit(2)),
                os.path.join(state, scd2.QUARANTINE_SUBDIR), "ingest_batch",
            )
        # restart: the checkpoint replays batch 2 in full, then batch 3
        scd2.process_batch(batches[2], 2, state)
        scd2.process_batch(batches[3], 3, state)
        assert _state_rows(state) == _state_rows(clean), f"torn after {torn_writes} writes"
