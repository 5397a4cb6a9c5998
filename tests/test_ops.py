"""Unit tests for core + analytics operators on small synthetic frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.ops import analytics, core


def test_dedup_latest_deterministic_tie(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2024-01-01", "a"),
            ("k1", "2024-01-02", "b"),
            ("k2", "2024-01-01", "c"),
            ("k2", "2024-01-01", "d"),  # exact tie on (key, order)
        ],
        "key STRING, ts STRING, id STRING",
    )
    out = core.dedup_latest(df, key="key", order_by="ts", tiebreak="id")
    rows = {r.key: r.id for r in out.collect()}
    assert rows == {"k1": "b", "k2": "d"}  # tie → id desc


def test_as_of_join_backward(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 100.0), ("A", 5, 101.0), ("A", 9, 102.0), ("B", 3, 50.0)],
        "sym STRING, t BIGINT, px DOUBLE",
    )
    trades = spark.createDataFrame(
        [("A", 4, 1), ("A", 5, 2), ("A", 20, 3), ("B", 2, 4), ("C", 1, 5)],
        "sym STRING, t BIGINT, trade_id BIGINT",
    )
    out = analytics.as_of_join(
        trades, quotes, key="sym", left_ts="t", right_ts="t",
        left_id="trade_id", right_tiebreak="px",
    )
    got = {r["trade_id"]: r["px"] for r in out.select("l.trade_id", "r.px").collect()}
    assert got[1] == 100.0  # t=4 → quote at t=1
    assert got[2] == 101.0  # t=5 → quote at t=5 (inclusive)
    assert got[3] == 102.0  # t=20 → latest
    assert got[4] is None   # B trade t=2 predates B quote t=3
    assert got[5] is None   # no quotes for C (left join preserved)


def test_topk_per_group_and_sort_topn(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i % 5)) for i in range(20)] + [("g2", 100, 9.0)],
        "g STRING, id BIGINT, v DOUBLE",
    )
    top = analytics.topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], 2)
    per_g = {}
    for r in top.collect():
        per_g.setdefault(r.g, []).append((r.v, r.id))
    assert per_g["g2"] == [(9.0, 100)]
    assert len(per_g["g1"]) == 2 and per_g["g1"][0] == (4.0, 4)

    topn = analytics.sort_topn(df, [F.col("v").desc(), F.col("id").asc()], 3)
    assert [r.id for r in topn.collect()] == [100, 4, 9]


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x BIGINT")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x BIGINT")
    assert sorted(r.x for r in analytics.union_distinct(a, b).collect()) == [1, 2, 3, 4]
    assert sorted(r.x for r in analytics.intersect(a, b).collect()) == [2, 3]
    assert sorted(r.x for r in analytics.except_rows(a, b).collect()) == [1, 2]
    assert sorted(r.x for r in analytics.except_rows(a, b, keep_dups=False).collect()) == [1]


def test_union_all_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id BIGINT, a STRING")
    b = spark.createDataFrame([(2, "y")], "id BIGINT, b STRING")
    out = analytics.union_all(a, b)
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 2


def test_filter_and_clean(spark):
    df = spark.createDataFrame(
        [("A1",), ("N10",), ("",), (None,), ("xyz",)], "grade STRING"
    )
    cleaned = core.clean_numeric(df, "grade", "A|N")
    vals = [r.grade for r in cleaned.collect()]
    assert vals[0] == 1.0 and vals[1] == 10.0
    assert vals[2] is None and vals[3] is None and vals[4] is None

    kept = core.filter_isin(df, "grade", ["A1", "N10"])
    assert kept.count() == 2


def test_normalize_empty_to_null(spark):
    df = spark.createDataFrame([("", "x"), ("y", "")], "a STRING, b STRING")
    out = core.normalize_empty_to_null(df)
    rows = out.collect()
    assert rows[0].a is None and rows[0].b == "x"
    assert rows[1].a == "y" and rows[1].b is None


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """Sketch-path accuracy contract: HLL distinct within 5% of exact,
    approx_percentile within 2% relative error of the exact quantiles
    at accuracy=10000 — the evidence that the 100 TB paths are usable
    substitutes for the oracle-checked exact twins."""
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05

    orders = read_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("exact"),
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("approx"),
    ).collect()[0]
    for e, a in zip(row["exact"], row["approx"]):
        assert abs(a - e) / e < 0.02, (e, a)


def test_gap_fill_dense_grid_and_forward_fill(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from lime_etl_spark.ops import timeseries

    rows = [
        (1, datetime(2024, 1, 1, 0, 5), 10.0),
        (1, datetime(2024, 1, 1, 0, 20), 20.0),   # same bucket as 0:05
        (1, datetime(2024, 1, 1, 2, 10), 40.0),   # 3 silent buckets before
        (2, datetime(2024, 1, 1, 5, 0), 7.0),     # single-bucket user
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = timeseries.gap_fill(df).orderBy("user_id", "bucket_start").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert len(u1) == 5  # 00:00 .. 02:00 inclusive, every 30 min
    assert [r["n_events"] for r in u1] == [2, 0, 0, 0, 1]
    assert [r["is_gap"] for r in u1] == [False, True, True, True, False]
    # forward fill carries the bucket average across the silence
    assert [r["last_avg_value"] for r in u1] == [15.0, 15.0, 15.0, 15.0, 40.0]
    assert u1[0]["total_value"] == 30.0 and u1[1]["total_value"] == 0.0
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1


def test_zscore_flags_spike_not_baseline(spark):
    from datetime import datetime, timedelta

    from lime_etl_spark.ops import timeseries

    base = datetime(2024, 1, 1)
    rows = [(i, 1, base + timedelta(minutes=i), 10.0 + (i % 2)) for i in range(10)]
    rows.append((99, 1, base + timedelta(minutes=99), 500.0))  # spike
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {r["event_id"]: r for r in timeseries.zscore_anomalies(df).collect()}
    assert out[99]["is_anomaly"] and out[99]["zscore"] > 3
    assert not any(out[i]["is_anomaly"] for i in range(10))
    assert out[0]["zscore"] is None  # no priors -> unscored, never flagged


def test_zscore_flags_flat_line_then_spike(spark):
    """Zero trailing std (constant history) makes z NULL — the break
    from a flat line must still be FLAGGED (it is the most extreme
    anomaly possible), while continuations of the flat line are not."""
    from datetime import datetime, timedelta

    from lime_etl_spark.ops import timeseries

    base = datetime(2024, 1, 1)
    rows = [(i, 1, base + timedelta(minutes=i), 5.0) for i in range(10)]
    rows.append((99, 1, base + timedelta(minutes=99), 1000.0))  # the break
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {r["event_id"]: r for r in timeseries.zscore_anomalies(df).collect()}
    assert out[99]["is_anomaly"] and out[99]["zscore"] is None
    assert out[99]["trail_std"] == 0.0
    # flat-line continuations: std 0 but value == mean -> not anomalous
    assert not any(out[i]["is_anomaly"] for i in range(10))


def test_gap_fill_interval_derived_from_bucket(spark):
    """The grid step derives from the bucket width — bucket='1 hour'
    must produce an HOURLY grid (the old independent 30-minute interval
    default mis-phased the grid: real buckets never joined and every
    other row read as a phantom gap)."""
    from datetime import datetime

    from lime_etl_spark.ops import timeseries

    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 10.0),
        (1, datetime(2024, 1, 1, 3, 40), 40.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = timeseries.gap_fill(df, bucket="1 hour").orderBy("bucket_start").collect()
    assert len(out) == 4  # 00:00 01:00 02:00 03:00 — hourly, not 30-min
    assert [r["n_events"] for r in out] == [1, 0, 0, 1]
    assert [r["is_gap"] for r in out] == [False, True, True, False]


def test_table_diff_semantics_and_null_sentinel(spark):
    """added/removed/changed classification; unchanged rows dropped;
    ("a", NULL) must NOT collide with ("a", "") (chr(1) sentinel)."""
    from lime_etl_spark.ops import core

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "id BIGINT, t STRING, u STRING",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", ""), (3, "c2", "z"), (5, "e", "v")],
        "id BIGINT, t STRING, u STRING",
    )
    got = {r.id: r.change for r in core.table_diff(old, new, "id", ["t", "u"]).collect()}
    # id=1 unchanged (absent); id=2 NULL->"" MUST surface as changed
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}

    import pytest

    with pytest.raises(ValueError, match="compare_cols"):
        core.table_diff(old, new, "id", [])


def test_interval_overlap_join_semantics(spark):
    """Binned interval join: exactly-once emission across shared bins
    (first-common-bin rule), closed-interval touching counts with
    overlap 0, disjoint pairs drop, overlap seconds exact."""
    from datetime import datetime

    from lime_etl_spark.ops import analytics

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [(1, 10, ts(0), ts(10)),    # long: spans 11 one-hour bins
         (1, 11, ts(20), ts(21)),
         (2, 12, ts(0), ts(1))],
        "k long, lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(1, 20, ts(5), ts(6)),     # inside the long interval
         (1, 21, ts(10), ts(12)),   # touches its end exactly
         (1, 22, ts(22), ts(23)),   # disjoint from both
         (2, 23, ts(0, 30), ts(2))],
        "k long, rid long, rs timestamp, re timestamp",
    )
    out = analytics.interval_overlap_join(
        left, right, "k", "lid", "rid", "ls", "le", "rs", "re", bin_seconds=3600
    ).collect()
    got = sorted((r["lid"], r["rid"], r["overlap_seconds"]) for r in out)
    assert got == [
        (10, 20, 3600),   # ts(5)-ts(6) fully inside -> 1h, emitted ONCE
        (10, 21, 0),      # closed-interval touch at ts(10)
        (12, 23, 1800),   # cross-key isolation: only k=2 with k=2
    ]


def test_interval_overlap_join_matches_bruteforce_property(spark):
    """Random intervals at several bin widths vs a quadratic Python
    reference — exactly-once emission and exact overlap seconds must
    hold regardless of how intervals straddle bucket boundaries."""
    from datetime import datetime, timedelta

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lime_etl_spark.ops import analytics

    base = datetime(2024, 1, 1)
    iv = st.tuples(
        st.integers(0, 2),            # key
        st.integers(0, 5000),         # start minutes
        st.integers(0, 600),          # duration minutes
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(iv, min_size=1, max_size=8), st.lists(iv, min_size=1, max_size=8),
           st.sampled_from([60, 3600, 86400]))
    def run(ls, rs, bin_seconds):
        left = spark.createDataFrame(
            [(k, i, base + timedelta(minutes=s), base + timedelta(minutes=s + d))
             for i, (k, s, d) in enumerate(ls)],
            "k long, lid long, ls timestamp, le timestamp",
        )
        right = spark.createDataFrame(
            [(k, i, base + timedelta(minutes=s), base + timedelta(minutes=s + d))
             for i, (k, s, d) in enumerate(rs)],
            "k long, rid long, rs timestamp, re timestamp",
        )
        got = sorted(
            (r["lid"], r["rid"], r["overlap_seconds"])
            for r in analytics.interval_overlap_join(
                left, right, "k", "lid", "rid", "ls", "le", "rs", "re",
                bin_seconds=bin_seconds,
            ).collect()
        )
        want = sorted(
            (i, j, int((min(le, re) - max(lst, rst)).total_seconds()))
            for i, (k1, s1, d1) in enumerate(ls)
            for j, (k2, s2, d2) in enumerate(rs)
            if k1 == k2
            for lst, le in [(base + timedelta(minutes=s1), base + timedelta(minutes=s1 + d1))]
            for rst, re in [(base + timedelta(minutes=s2), base + timedelta(minutes=s2 + d2))]
            if lst <= re and rst <= le
        )
        assert got == want

    run()


def test_sort_rows_rejects_flag_length_mismatch(spark):
    """zip() silently truncated to the shorter list, dropping sort keys
    and producing a wrong order with no error."""
    import pytest

    from lime_etl_spark.ops import core

    df = spark.createDataFrame([(1, 2, 3)], "a bigint, b bigint, c bigint")
    with pytest.raises(ValueError, match="3 sort columns but 2"):
        core.sort_rows(df, ["a", "b", "c"], ascending=[True, False])


def test_dedup_latest_preserves_callers_rn_column(spark):
    """A caller's own '__rn' column used to be overwritten by the
    window working column and then dropped from the output."""
    from lime_etl_spark.ops import core

    df = spark.createDataFrame(
        [(1, 10, 7), (1, 20, 8)], "k bigint, ts bigint, __rn bigint"
    )
    out = core.dedup_latest(df, "k", "ts")
    assert "__rn" in out.columns
    row = out.collect()[0]
    assert row["ts"] == 20 and row["__rn"] == 8
