"""ops/quality.validate semantics on hand-built frames (the registry
oracle pins fixture-scale parity)."""

from __future__ import annotations

from lime_etl_spark.ops import quality as Q


def _report(df, rules):
    return {
        (r["rule"], r["column"]): r["n_violations"]
        for r in Q.validate(df, rules).collect()
    }


def test_row_rules_single_scan_counts(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, None, -5.0), (3, "X", 2e6), (None, "F", None)],
        "k long, status string, price double",
    )
    got = _report(
        df,
        [
            Q.not_null("k"),
            Q.not_null("status"),
            Q.accepted_values("status", ["O", "F"]),
            Q.in_range("price", lo=0, hi=1_000_000),
        ],
    )
    assert got[("not_null", "k")] == 1
    assert got[("not_null", "status")] == 1
    # NULL status is not an accepted_values violation (not_null's job)
    assert got[("accepted_values", "status")] == 1
    # NULL price is not a range violation; -5 and 2e6 are
    assert got[("in_range", "price")] == 2
    # row rules fuse into one aggregate scan
    plan = Q.validate(df, [Q.not_null("k"), Q.in_range("price", lo=0)])._jdf \
        .queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_unique_counts_all_rows_of_duplicated_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k long"
    )
    got = _report(df, [Q.unique("k")])
    # all 3 rows of the duplicated key count; NULLs are exempt
    assert got[("unique", "k")] == 3


def test_unique_zero_when_clean(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    assert _report(df, [Q.unique("k")]) == {("unique", "k"): 0}


def test_foreign_key_orphans(spark):
    facts = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    got = _report(facts, [Q.foreign_key("fk", dim, "id")])
    assert got[("foreign_key", "fk")] == 1  # 9 is orphaned; NULL exempt


def test_gate_passes_clean_and_raises_with_counts(spark):
    import pytest

    clean = spark.createDataFrame([(1,), (2,)], "k long")
    assert Q.gate(clean, [Q.not_null("k"), Q.unique("k")]) is clean
    dirty = spark.createDataFrame([(1,), (1,), (None,)], "k long")
    with pytest.raises(Q.QualityError) as exc:
        Q.gate(dirty, [Q.not_null("k"), Q.unique("k")])
    assert sorted(exc.value.failures) == [("not_null", "k", 1), ("unique", "k", 2)]


def test_empty_table_passes_not_crashes(spark):
    empty = spark.createDataFrame([], "k long, s string")
    got = _report(empty, [Q.not_null("k"), Q.accepted_values("s", ["x"])])
    assert got == {("not_null", "k"): 0, ("accepted_values", "s"): 0}
    assert Q.gate(empty, [Q.not_null("k")]) is empty


def test_empty_rules_empty_report(spark):
    df = spark.createDataFrame([(1,)], "k long")
    assert Q.validate(df, []).collect() == []
    assert Q.gate(df, []) is df


def test_with_row_count_rides_the_scan(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    got = _report(df, [Q.not_null("k")])
    assert got == {("not_null", "k"): 1}
    rows = {
        (r["rule"], r["column"]): r["n_violations"]
        for r in Q.validate(df, [Q.not_null("k")], with_row_count=True).collect()
    }
    assert rows[("row_count", "*")] == 3
    import pytest

    with pytest.raises(Q.QualityError):
        Q.gate(df, [Q.not_null("k")], with_row_count=True)
    clean = df.filter("k is not null")
    assert Q.gate(clean, [Q.not_null("k")], with_row_count=True) == 2


def test_drift_report_exact_tvd(spark):
    ref = spark.createDataFrame(
        [(float(x),) for x in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]], "v double"
    )
    cur = spark.createDataFrame(
        [(float(x),) for x in [5, 6, 7, 8, 9, 10, 11, 12, -3]], "v double"
    )
    rows = Q.drift_report(ref, cur, "v", n_bins=5).collect()
    # hand-computed: p=[0,2/11,2/11,2/11,2/11,3/11,0] vs
    # q=[1/9,0,0,1/9,2/9,3/9,2/9] -> TVD = 43/99
    assert all(r["tvd"] == 43 / 99 for r in rows)
    by_bin = {r["bin"]: (r["n_ref"], r["n_cur"]) for r in rows}
    assert by_bin[-1] == (0, 1)      # current-only underflow
    assert by_bin[5] == (0, 2)       # current-only overflow
    assert by_bin[4] == (3, 3)       # hi endpoint clamps into the last bin


def test_drift_identical_snapshots_zero(spark):
    ref = spark.createDataFrame([(float(x),) for x in range(20)], "v double")
    rows = Q.drift_report(ref, ref, "v", n_bins=4).collect()
    assert rows and all(r["tvd"] == 0.0 for r in rows)


def test_drift_degenerate_constant_column(spark):
    ref = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    cur = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    by_bin = {
        r["bin"]: (r["n_ref"], r["n_cur"], r["tvd"])
        for r in Q.drift_report(ref, cur, "v", n_bins=5).collect()
    }
    # hi == lo: all in-range mass lands in bin 0; the 2.0 overflows
    assert by_bin[0][:2] == (2, 1) and by_bin[5][:2] == (0, 1)
    assert by_bin[0][2] == 0.5


def test_drift_empty_snapshot_yields_null_not_nan(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    rows = Q.drift_report(ref, empty, "v", n_bins=4).collect()
    assert rows and all(r["tvd"] is None for r in rows)


def test_drift_empty_reference_bins_null_not_top_bin(spark):
    """An empty REFERENCE defines no bin grid: current rows bin to NULL
    ("nothing to compare against"), not to n_bins-1 — least() skips
    NULL args, so the NULL raw bin used to collapse ALL current mass
    into the top bin, a silently wrong histogram even with tvd NULL."""
    empty = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,), (50.0,), (99.0,)], "v double")
    rows = Q.drift_report(empty, cur, "v", n_bins=10).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] is None
    assert rows[0]["n_cur"] == 3 and rows[0]["n_ref"] == 0
    assert rows[0]["tvd"] is None
