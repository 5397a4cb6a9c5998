"""Incremental quality monitoring (streaming/quality.py): multi-batch
equivalence with the batch validate, replay idempotency, the timeline
view, empty batches, and the unique-rule rejection."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.ops import quality as Q
from lime_etl_spark.streaming import quality as sq


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, v, None) for i, (u, t, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _ts(day):
    return datetime(2024, 1, day)


_RULES = (
    Q.not_null("user_id"),
    Q.accepted_values("event_type", ("a", "b")),
    Q.in_range("value", lo=0.0, hi=10.0),
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_multibatch_report_equals_batch_validate(spark, tmp_path):
    rows = [
        (1, "a", _ts(1), 1.0),
        (None, "a", _ts(1), 2.0),     # not_null violation
        (2, "zz", _ts(2), 3.0),       # accepted_values violation
        (3, "b", _ts(2), -1.0),       # in_range violation
        (4, "b", _ts(3), 99.0),       # in_range violation
        (5, "a", _ts(3), 5.0),
    ]
    state = str(tmp_path / "state")
    sq.process_batch(_events(spark, rows[:2]), 0, state, _RULES)
    sq.process_batch(_events(spark, rows[2:4]), 1, state, _RULES)
    sq.process_batch(_events(spark, rows[4:]), 2, state, _RULES)
    got = _rows(sq.report(spark, state))
    want = _rows(Q.validate(_events(spark, rows), _RULES, with_row_count=True))
    assert got == want
    counts = {(r, c): n for r, c, n in got}
    assert counts[("not_null", "user_id")] == 1
    assert counts[("accepted_values", "event_type")] == 1
    assert counts[("in_range", "value")] == 2
    assert counts[("row_count", "*")] == 6


def test_replay_is_idempotent_and_empty_batch_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = _events(spark, [(1, "a", _ts(1), 1.0), (None, "a", _ts(1), 2.0)])
    b1 = _events(spark, [])
    sq.process_batch(b0, 0, state, _RULES)
    sq.process_batch(b1, 1, state, _RULES)  # empty batch mid-stream
    before = _rows(sq.report(spark, state))
    sq.process_batch(b0, 0, state, _RULES)  # replay
    assert _rows(sq.report(spark, state)) == before
    counts = {(r, c): n for r, c, n in before}
    assert counts[("row_count", "*")] == 2
    assert counts[("not_null", "user_id")] == 1


def test_timeline_exposes_per_batch_counts(spark, tmp_path):
    state = str(tmp_path / "state")
    sq.process_batch(
        _events(spark, [(None, "a", _ts(1), 1.0)]), 0, state, _RULES
    )
    sq.process_batch(
        _events(spark, [(None, "a", _ts(2), 1.0), (None, "a", _ts(2), 2.0)]),
        1, state, _RULES,
    )
    tl = {
        (r["ingest_batch"], r["rule"], r["column"]): r["n_violations"]
        for r in sq.timeline(spark, state).collect()
    }
    assert tl[(0, "not_null", "user_id")] == 1
    assert tl[(1, "not_null", "user_id")] == 2


def test_foreign_key_rule_is_decomposable(spark, tmp_path):
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    rules = (Q.foreign_key("user_id", dim, "k"),)
    rows = [(1, "a", _ts(1), 1.0), (9, "a", _ts(1), 1.0), (8, "a", _ts(2), 1.0)]
    state = str(tmp_path / "state")
    sq.process_batch(_events(spark, rows[:2]), 0, state, rules)
    sq.process_batch(_events(spark, rows[2:]), 1, state, rules)
    got = _rows(sq.report(spark, state))
    want = _rows(Q.validate(_events(spark, rows), rules, with_row_count=True))
    assert got == want
    assert {(r, c): n for r, c, n in got}[("foreign_key", "user_id")] == 2


def test_unique_rule_rejected_with_pointer(spark, tmp_path):
    with pytest.raises(ValueError, match="streaming/dedup"):
        sq.process_batch(
            _events(spark, [(1, "a", _ts(1), 1.0)]),
            0,
            str(tmp_path / "state"),
            (Q.unique("event_id"),),
        )


def test_duplicate_kind_column_rules_rejected(spark, tmp_path):
    """Two rules of the same kind on one column would silently MERGE in
    report() (its state keys rows by (rule, column)) while the batch
    validate keeps two ambiguous rows — found by the generative
    streaming harness (round 8); the monitor must refuse at attach."""
    with pytest.raises(ValueError, match="duplicate rule in_range"):
        sq.process_batch(
            _events(spark, [(1, "a", _ts(1), 1.0)]),
            0,
            str(tmp_path / "state"),
            (Q.in_range("value", lo=0.0), Q.in_range("value", hi=10.0)),
        )


def test_streamed_fixture_equals_batch_validate(spark, sf_dir):
    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.streaming.quality import _FIXTURE_RULES

    got = _rows(sq.run_quality_batchlike(spark, sf_dir))
    ev = read_table(spark, sf_dir, "events")
    want = _rows(Q.validate(ev, list(_FIXTURE_RULES), with_row_count=True))
    assert got == want
