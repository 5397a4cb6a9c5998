"""Incremental funnel maintenance (streaming/funnel.py): ordered
multi-batch equivalence with the batch operator, replay idempotency,
and contract-violation quarantine."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from lime_etl_spark.ops import behavior
from lime_etl_spark.streaming import funnel as sfunnel

STEPS = ["a", "b", "c"]


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _report(spark, state):
    return sorted(
        (r["step_idx"], r["n_users"]) for r in
        sfunnel.funnel_report(spark, state, STEPS).collect()
    )


def test_multibatch_equals_batch(spark, tmp_path):
    rows = [
        (1, "a", _ts(1)), (2, "a", _ts(1)), (1, "b", _ts(2)),
        (1, "c", _ts(3)), (2, "b", _ts(4)),     # batch 2
        (2, "c", _ts(5)), (3, "a", _ts(5)),     # batch 3
    ]
    state = str(tmp_path / "s")
    sfunnel.process_batch(_df(spark, rows[:3]), 0, state, STEPS)
    sfunnel.process_batch(_df(spark, rows[3:5]), 1, state, STEPS)
    sfunnel.process_batch(_df(spark, rows[5:]), 2, state, STEPS)
    want = sorted(
        (r["step_idx"], r["n_users"])
        for r in behavior.funnel(_df(spark, rows), STEPS).collect()
    )
    assert _report(spark, state) == want == [(1, 3), (2, 2), (3, 2)]


def test_step_order_respected_across_batches(spark, tmp_path):
    # b arrives in a LATER batch but with ts before the user's a: the
    # monotone contract quarantines it; the chain never counts it
    state = str(tmp_path / "s")
    sfunnel.process_batch(_df(spark, [(1, "a", _ts(5))]), 0, state, STEPS)
    sfunnel.process_batch(_df(spark, [(1, "b", _ts(2))]), 1, state, STEPS)
    assert _report(spark, state) == [(1, 1), (2, 0), (3, 0)]
    quar = spark.read.parquet(os.path.join(state, sfunnel.QUARANTINE_SUBDIR))
    assert quar.count() == 1 and quar.collect()[0]["event_type"] == "b"
    # an on-time b then completes the chain
    sfunnel.process_batch(_df(spark, [(1, "b", _ts(6))]), 2, state, STEPS)
    assert _report(spark, state) == [(1, 1), (2, 1), (3, 0)]


def test_replay_any_batch_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "s")
    b0 = _df(spark, [(1, "a", _ts(1))])
    b1 = _df(spark, [(1, "b", _ts(2)), (2, "a", _ts(2))])
    sfunnel.process_batch(b0, 0, state, STEPS)
    sfunnel.process_batch(b1, 1, state, STEPS)
    before = _report(spark, state)
    sfunnel.process_batch(b1, 1, state, STEPS)
    sfunnel.process_batch(b0, 0, state, STEPS)
    assert _report(spark, state) == before == [(1, 2), (2, 1), (3, 0)]


def test_window_bound_held_across_batches(spark, tmp_path):
    # anchor in batch 0; a step-2 event lands beyond the 7-day window
    # in a later batch and must not count, exactly as in batch mode
    state = str(tmp_path / "s")
    sfunnel.process_batch(
        _df(spark, [(1, "a", _ts(1))]), 0, state, STEPS, window_days=7
    )
    sfunnel.process_batch(
        _df(spark, [(1, "b", _ts(20))]), 1, state, STEPS, window_days=7
    )
    assert _report(spark, state) == [(1, 1), (2, 0), (3, 0)]


def test_streamed_fixture_equals_batch(spark, sf_dir):
    from lime_etl_spark.io.sources import read_table

    got = sorted(
        tuple(r) for r in sfunnel.run_funnel_batchlike(spark, sf_dir).collect()
    )
    ev = read_table(spark, sf_dir, "events")
    want = sorted(
        tuple(r)
        for r in behavior.funnel(
            ev, ["signup", "view", "purchase"], window_days=7
        ).collect()
    )
    assert got == want


def test_hwm_never_regresses_on_quarantined_batch(spark, tmp_path):
    """Review repro: a non-qualifying event advances the high-water
    mark without being retained as state; a later fully-quarantined
    batch must not regress the hwm, or contract-violating events get
    accepted and the stream diverges from the batch funnel."""
    state = str(tmp_path / "s")
    # c@day10 is a step TYPE but does not qualify (no b yet): hwm=day10
    sfunnel.process_batch(
        _df(spark, [(1, "a", _ts(1)), (1, "c", _ts(10))]), 0, state, STEPS
    )
    # everything late -> fully quarantined; hwm must STAY at day10
    sfunnel.process_batch(_df(spark, [(1, "b", _ts(5))]), 1, state, STEPS)
    st = sfunnel.current_state(spark, state, STEPS).collect()[0]
    assert st["__hwm"] == _ts(10)
    # so this contract violation also quarantines instead of setting t1
    sfunnel.process_batch(_df(spark, [(1, "b", _ts(7))]), 2, state, STEPS)
    assert _report(spark, state) == [(1, 1), (2, 0), (3, 0)]
    quar = spark.read.parquet(os.path.join(state, sfunnel.QUARANTINE_SUBDIR))
    assert quar.count() == 2
