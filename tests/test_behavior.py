"""Semantic tests for ops/behavior.py (cohort retention, ordered
funnel, SCD2 history, point-in-time join) on hand-built frames —
the oracle differential in test_oracle.py covers the fixture-scale
parity; these pin the edge semantics."""

from __future__ import annotations
import pytest

from datetime import datetime

from pyspark.sql import functions as F

from lime_etl_spark.ops import behavior


def _ts(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, 1.0) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_strict_order(spark):
    ev = _events(
        spark,
        [
            (1, "a", _ts(1)), (1, "b", _ts(2)),   # completes a->b
            (2, "b", _ts(1)), (2, "a", _ts(2)),   # b BEFORE a: step b must not count
            (3, "a", _ts(3)),                     # a only
        ],
    )
    out = {r["step"]: r["n_users"] for r in behavior.funnel(ev, ["a", "b"]).collect()}
    assert out == {"a": 3, "b": 1}


def test_funnel_empty_input_reports_zero_counts(spark):
    """Round-3 ADVICE: a global sum over zero rows is NULL — an empty
    events table (or funnel_report before any batch) must report
    n_users = 0 per step, with NULL rates via the denominator guard."""
    ev = _events(spark, [])
    rows = behavior.funnel(ev, ["a", "b"]).orderBy("step_idx").collect()
    assert [(r["step"], r["n_users"]) for r in rows] == [("a", 0), ("b", 0)]
    assert all(r["pct_of_first"] is None for r in rows)
    assert all(r["pct_of_prev"] is None for r in rows)


def test_funnel_window_bound_excludes_late_steps(spark):
    ev = _events(
        spark,
        [
            (1, "a", _ts(1)), (1, "b", _ts(2)),    # within 7d
            (2, "a", _ts(1)), (2, "b", _ts(20)),   # b lands after the 7d anchor
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in behavior.funnel(ev, ["a", "b"], window_days=7).collect()
    }
    assert out == {"a": 2, "b": 1}


def test_funnel_conversion_rates(spark):
    ev = _events(
        spark,
        [
            (1, "a", _ts(1)), (1, "b", _ts(2)),
            (2, "a", _ts(1)),
            (3, "a", _ts(1)), (3, "b", _ts(2)),
            (4, "a", _ts(1)),
        ],
    )
    rows = {r["step"]: r for r in behavior.funnel(ev, ["a", "b"]).collect()}
    assert rows["b"]["pct_of_first"] == 0.5
    assert rows["b"]["pct_of_prev"] == 0.5
    assert rows["a"]["pct_of_first"] == 1.0
    assert rows["a"]["pct_of_prev"] is None


def test_cohort_retention_counts_distinct_users_per_offset(spark):
    # Mondays: 2024-01-01 and 2024-01-08. Users 1,2 start week 1;
    # only user 1 returns in week 2 (twice — must count once).
    ev = _events(
        spark,
        [
            (1, "x", _ts(2)), (1, "x", _ts(9)), (1, "x", _ts(10)),
            (2, "x", _ts(3)),
            (3, "x", _ts(9)),  # cohort of week 2
        ],
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in behavior.cohort_retention(ev).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(out) == 3


def test_scd2_collapses_unchanged_states(spark):
    ev = _events(
        spark,
        [
            (1, "s1", _ts(1)), (1, "s1", _ts(2)), (1, "s2", _ts(3)),
            (1, "s1", _ts(4)),
        ],
    )
    hist = behavior.scd2_from_change_stream(
        ev, "user_id", "event_type", "ts", "event_id"
    ).orderBy("version").collect()
    assert [(r["state"], r["version"], r["is_current"]) for r in hist] == [
        ("s1", 1, False), ("s2", 2, False), ("s1", 3, True)
    ]
    # valid_to chains to the NEXT version's start (not the last
    # unchanged observation)
    assert hist[0]["valid_from"] == _ts(1)
    assert hist[0]["valid_to"] == _ts(3)
    assert hist[2]["valid_to"] is None


def test_point_in_time_join_picks_covering_interval(spark):
    states = _events(
        spark,
        [(1, "s1", _ts(2)), (1, "s2", _ts(5))],
    )
    hist = behavior.scd2_from_change_stream(
        states, "user_id", "event_type", "ts", "event_id"
    )
    facts = spark.createDataFrame(
        [(100, 1, _ts(1)), (101, 1, _ts(3)), (102, 1, _ts(5)), (103, 1, _ts(9))],
        "fact_id long, user_id long, ts timestamp",
    )
    out = {
        r["fact_id"]: r["pit_state"]
        for r in behavior.point_in_time_join(facts, hist, "user_id", "ts").collect()
    }
    # before any state -> NULL; boundary ts==valid_from of v2 -> v2
    # (interval is [from, to)); open-ended current version covers late facts
    assert out == {100: None, 101: "s1", 102: "s2", 103: "s2"}


def test_funnel_single_fact_exchange(spark, sf_dir):
    """The chained step windows must reuse ONE hash exchange of the
    fact table (same partition spec); only the k-row reductions may
    add more."""
    from lime_etl_spark.io.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    plan = behavior.funnel(
        ev, ["signup", "view", "purchase"], window_days=7
    )._jdf.queryExecution().executedPlan().toString()
    import re

    # exchanges hashing on user_id: exactly one
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan


# ---------------------------------------------------------------------------
# Property tests vs pure-Python references
# ---------------------------------------------------------------------------

from datetime import timedelta  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EV = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.sampled_from(["a", "b", "c"]),               # type
        st.integers(min_value=1, max_value=20),         # day
        st.integers(min_value=0, max_value=23),         # hour
    ),
    min_size=1,
    max_size=25,
)


def _py_funnel(rows, steps, window_days=None):
    by_user: dict = {}
    for eid, (u, t, ts) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, eid, t))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        prev = anchor = None
        for i, s in enumerate(steps):
            cand = None
            for ts, _, t in evs:
                if t != s:
                    continue
                if i > 0:
                    if not ts > prev:
                        continue
                    if window_days is not None and ts > anchor + timedelta(
                        days=window_days
                    ):
                        continue
                cand = ts
                break  # sorted ⇒ first qualifying == earliest
            if cand is None:
                break
            if i == 0:
                anchor = cand
            prev = cand
            counts[i] += 1
    return counts


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(_EV)
def test_funnel_matches_python_reference(spark, raw):
    rows = [(u, t, _ts(d, h)) for (u, t, d, h) in raw]
    ev = _events(spark, rows)
    for window_days in (None, 7):
        got = {
            r["step_idx"]: r["n_users"]
            for r in behavior.funnel(
                ev, ["a", "b", "c"], window_days=window_days
            ).collect()
        }
        expected = _py_funnel(rows, ["a", "b", "c"], window_days)
        assert [got[i + 1] for i in range(3)] == expected


def _py_scd2(rows):
    by_user: dict = {}
    for eid, (u, t, ts) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, eid, t))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        versions = []
        for ts, _, t in evs:
            if not versions or versions[-1][0] != t:
                versions.append((t, ts))
        for i, (state, ts) in enumerate(versions):
            valid_to = versions[i + 1][1] if i + 1 < len(versions) else None
            out.append((u, state, ts, valid_to, i + 1, valid_to is None))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(_EV)
def test_scd2_matches_python_reference(spark, raw):
    rows = [(u, t, _ts(d, h)) for (u, t, d, h) in raw]
    ev = _events(spark, rows)
    got = sorted(
        (
            r["user_id"], r["state"], r["valid_from"], r["valid_to"],
            r["version"], r["is_current"],
        )
        for r in behavior.scd2_from_change_stream(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    )
    assert got == _py_scd2(rows)


def test_funnel_latencies_exact_seconds(spark):
    ev = _events(
        spark,
        [
            (1, "a", _ts(1, 0)), (1, "b", _ts(1, 2)),       # 7200 s
            (2, "a", _ts(1, 0)), (2, "b", _ts(2, 0)),       # 86400 s
            (3, "a", _ts(1, 0)),                            # never converts
        ],
    )
    rows = {r["transition"]: r for r in behavior.funnel_latencies(ev, ["a", "b"]).collect()}
    r = rows["a->b"]
    assert (r["n_converted"], r["min_seconds"], r["max_seconds"], r["sum_seconds"]) == (
        2, 7200, 86400, 93600
    )


def test_funnel_latencies_single_pass_all_transitions(spark):
    """All transitions come from ONE aggregation over the per-user step
    times (conditional aggregates per leg, exploded): the plan contains
    no Union — the old shape unioned one full window-chain+groupBy
    subtree per transition. A 3-step funnel with an unconverted middle
    user pins the conditional-count semantics leg by leg."""
    ev = _events(
        spark,
        [
            (1, "a", _ts(1, 0)), (1, "b", _ts(1, 1)), (1, "c", _ts(1, 3)),
            (2, "a", _ts(1, 0)), (2, "b", _ts(1, 2)),   # never reaches c
            (3, "a", _ts(1, 0)),                        # never reaches b
        ],
    )
    out = behavior.funnel_latencies(ev, ["a", "b", "c"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    rows = {r["transition"]: r for r in out.collect()}
    assert rows["a->b"]["n_converted"] == 2
    assert rows["a->b"]["min_seconds"] == 3600
    assert rows["a->b"]["max_seconds"] == 7200
    assert rows["b->c"]["n_converted"] == 1
    assert rows["b->c"]["sum_seconds"] == 7200
    assert rows["a->b"]["step_idx"] == 1 and rows["b->c"]["step_idx"] == 2


def test_scd2_single_key_exchange(spark, sf_dir):
    """Both window passes (transition lag + resolve lead/row_number)
    share ONE hash exchange on the key."""
    from lime_etl_spark.io.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    plan = behavior.scd2_from_change_stream(
        ev, "user_id", "event_type", "ts", "event_id"
    )._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1, plan


def _py_cohort(rows):
    from datetime import timedelta

    def monday(d):
        d = d.date()
        return d - timedelta(days=d.weekday())

    first = {}
    for u, _, ts in rows:
        if u not in first or ts < first[u]:
            first[u] = ts
    marked = {(monday(first[u]), (monday(ts) - monday(first[u])).days // 7, u)
              for u, _, ts in rows}
    from collections import Counter

    active = Counter((cw, off) for cw, off, _ in marked)
    sizes = {cw: n for (cw, off), n in active.items() if off == 0}
    return {
        (str(cw), off): (n, sizes[cw], round(n / sizes[cw], 6))
        for (cw, off), n in active.items()
    }


@settings(max_examples=10, deadline=None)
@given(_EV)
def test_cohort_matches_python_reference(spark, raw):
    rows = [(u, t, _ts(d, h)) for (u, t, d, h) in raw]
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in behavior.cohort_retention(_events(spark, rows)).collect()
    }
    assert got == _py_cohort(rows)
