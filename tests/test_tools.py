"""Unit tests for the measurement tools themselves (spill_check's
distributed checksum, soak stream generators, rehearsal session knobs)
— the artifacts they produce back scale claims, so their own
correctness is load-bearing."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.tools.spill_check import content_checksum


def test_content_checksum_order_independent(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", 2.5), (3, None, None)],
        "id bigint, s string, v double",
    )
    b = a.orderBy(F.col("id").desc()).repartition(3)
    assert content_checksum(a) == content_checksum(b)


def test_content_checksum_detects_value_change(spark):
    a = spark.createDataFrame([(1, 1.5), (2, 2.5)], "id bigint, v double")
    b = spark.createDataFrame([(1, 1.5), (2, 2.6)], "id bigint, v double")
    c = spark.createDataFrame([(1, 1.5), (2, None)], "id bigint, v double")
    assert content_checksum(a) != content_checksum(b)
    assert content_checksum(a) != content_checksum(c)


def test_content_checksum_absorbs_float_noise(spark):
    """Spill changes accumulation order; sub-6dp float noise must not
    flip the digest (queries define outputs to 6dp)."""
    a = spark.createDataFrame([(1, 0.1 + 0.2)], "id bigint, v double")
    b = spark.createDataFrame([(1, 0.3000000000000004)], "id bigint, v double")
    assert content_checksum(a) == content_checksum(b)


def test_content_checksum_arrays_and_rowcount(spark):
    a = spark.createDataFrame([(1, [1.0, 2.0])], "id bigint, v array<double>")
    b = spark.createDataFrame([(1, [1.0, 2.5])], "id bigint, v array<double>")
    assert content_checksum(a) != content_checksum(b)
    digest, rows = content_checksum(a)
    assert rows == 1


def test_soak_rate_schemas_match_consumers(spark):
    """The soak's synthetic streams must carry the columns the real
    operators consume (session_windows needs value; dedup needs
    doc_id/text) — a drift here would crash mid-soak, 3 minutes in."""
    from lime_etl_spark.tools.streaming_soak import rate_documents, rate_events

    ev = rate_events(spark, 1)
    assert {"event_id", "ts", "user_id", "event_type", "value"} <= set(ev.columns)
    docs = rate_documents(spark, 1)
    assert {"doc_id", "text"} <= set(docs.columns)


def test_content_checksum_canonicalizes_negative_zero(spark):
    """±1e-7 rounds to -0.0 vs 0.0 across spill-reordered runs — both
    must hash identically (review finding)."""
    a = spark.createDataFrame([(1, 1e-7)], "id bigint, v double")
    b = spark.createDataFrame([(1, -1e-7)], "id bigint, v double")
    assert content_checksum(a) == content_checksum(b)


def test_content_checksum_rounds_array_elements(spark):
    """Doubles INSIDE arrays get the same 6dp canonicalization as
    top-level doubles (review finding: centroid vectors reorder under
    spill too)."""
    a = spark.createDataFrame([(1, [0.1 + 0.2, -1e-7])], "id bigint, v array<double>")
    b = spark.createDataFrame([(1, [0.3000000000000004, 1e-7])], "id bigint, v array<double>")
    assert content_checksum(a) == content_checksum(b)


def test_parse_byte_conf_rejects_garbage_suffix():
    """'128mk' must fall back to the default, not parse as 128 bytes
    (review finding)."""
    from lime_etl_spark.registry import _parse_byte_conf as p

    assert p("128mk") == 134217728
    assert p("1bg") == 134217728
    assert p("128mk", default=7) == 7


def test_rate_documents_distinct_up_to_vocab(spark):
    """vocab_docs distinct base documents must actually be distinct —
    an earlier %97 word hash capped them at 97 (review finding). The
    rate source can't run in a unit test; replicate the text expression
    over a static range."""
    from pyspark.sql import functions as F

    vocab = 400
    base = F.col("value") % vocab
    words = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.concat(F.lit("w"), ((base * 31 + i * 13) % 9973).cast("string")),
    )
    df = spark.range(vocab).select(F.col("id").alias("value")).select(
        F.array_join(words, " ").alias("text")
    )
    assert df.distinct().count() == vocab


def test_bench_exec_metric_honest_for_eager_plans():
    """r5 verdict 'what's wrong #1': BENCH carried a 76x-understated
    exec-only number for queries whose construction executes eagerly.
    The harness must (a) flag them in the registry, (b) publish
    fresh-plan warm as their exec metric."""
    import bench
    from lime_etl_spark.registry import REGISTRY

    # the known eager constructors are flagged
    assert REGISTRY["dedup_near_dup_groups"].eager_plan
    assert REGISTRY["dedup_components"].eager_plan
    # lazy headline queries are not
    assert not REGISTRY["q1_pricing_summary"].eager_plan
    # metric selection: eager -> fresh warm; lazy -> built-plan re-run
    assert bench.exec_metric(True, 3.4, 0.044) == 3.4
    assert bench.exec_metric(False, 3.4, 0.044) == 0.044


def test_fault_check_sentinels_mix_and_unknown_names():
    """@primary/@all expand wherever they appear in the query list, and
    an unknown name dies with a friendly SystemExit BEFORE any Spark
    session spins up — it used to KeyError deep inside the spawned
    phase only when the sentinel wasn't the entire list."""
    import pytest

    from lime_etl_spark.tools.fault_check import phase_retry

    with pytest.raises(SystemExit, match="unknown query 'nope'"):
        phase_retry("/nonexistent", "/tmp/out.json", queries=["@primary", "nope"])


def test_was_submitted_detects_pre_gateway_spark_submit(monkeypatch):
    """PYSPARK_GATEWAY_PORT (exported by spark-submit's PythonRunner
    before user code runs) must count as 'submitted' even when no py4j
    gateway is attached yet and SparkConf() is empty — otherwise the
    local[N] fallback overrides `spark-submit --master yarn`
    (round-6 advice: session.py:103)."""
    from lime_etl_spark.session import _was_submitted

    for var in ("PYSPARK_GATEWAY_PORT", "SPARK_MASTER", "MASTER"):
        monkeypatch.delenv(var, raising=False)
    # Simulate the pre-gateway state: SparkConf must not see a JVM-side
    # spark.master. In this pytest process a JVM may already exist with
    # spark.master set, so stub the conf probe to the empty pre-gateway
    # behavior rather than fighting the live session.
    import lime_etl_spark.session as sess_mod
    import pyspark

    class EmptyConf:
        def __init__(self, *a, **k):
            pass

        def contains(self, key):
            return False

    monkeypatch.setattr(pyspark, "SparkConf", EmptyConf)
    assert not _was_submitted()
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "43123")
    assert _was_submitted()


def test_gencheck_canon_and_compare_primitives():
    """The generative harness's exactness primitives: full-precision
    hex floats, scale-insensitive Decimal normalization (Spark
    sum(dec(18,6)) -> dec(28,6) vs DuckDB dec(38,6) must compare
    equal), NaN stability, bytes, and order-insensitive rowset
    comparison with None-first ordering."""
    from decimal import Decimal

    from lime_etl_spark.tools.gencheck import canon, compare

    assert canon(0.1) == (0.1).hex()
    assert canon(float("nan")) == "nan"
    assert canon(Decimal("123.400000")) == canon(Decimal("123.40"))
    assert canon(Decimal("123.400001")) != canon(Decimal("123.40"))
    assert canon(b"\x00\xff") == "00ff"
    assert canon(None) is None

    rows_a = [(1, "x"), (None, "y"), (2, "z")]
    rows_b = [(2, "z"), (1, "x"), (None, "y")]
    assert compare(rows_a, ["i", "s"], rows_b, ["i", "s"]) == []
    # column-name mismatch reported before values
    errs = compare(rows_a, ["i", "s"], rows_b, ["i", "t"])
    assert errs and "columns" in errs[0]
    errs = compare(rows_a, ["i", "s"], rows_b[:2], ["i", "s"])
    assert errs and "rowcount" in errs[0]
    errs = compare([(1, "x")], ["i", "s"], [(1, "y")], ["i", "s"])
    assert errs and "values" in errs[0]
    # column ORDER must not matter (compare sorts by name)
    assert compare(
        [("x", 1)], ["s", "i"], [(1, "x")], ["i", "s"]
    ) == []


def test_gencheck_hash_mode_matches_full_mode(spark, sf_dir, oracle_sf_dir):
    """The collect-free hash compare (r9 verdict task #2) must deliver
    the SAME verdicts as the full row-by-row compare: identical
    pass/fail and row counts over a seed block, and a planted
    single-cell diff must flip the hash while leaving the count."""
    from lime_etl_spark.tools import gencheck as gc

    duck = gc.duck_connect(oracle_sf_dir)
    try:
        for seed in (0, 1, 2, 7, 11, 13):
            full = gc.check_seed(spark, duck, seed, oracle_sf_dir, "full")
            hsh = gc.check_seed(spark, duck, seed, oracle_sf_dir, "hash")
            assert ("rows" in full) == ("rows" in hsh), (seed, full, hsh)
            assert full.get("rows") == hsh.get("rows"), (seed, full, hsh)
            assert "error" not in full and "error" not in hsh, (full, hsh)
    finally:
        duck.close()

    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    c1, a1, cols1 = gc._spark_hash_fold(base)
    c2, a2, _ = gc._spark_hash_fold(
        base.withColumn(
            "v", F.when(F.col("k") == 37, F.lit(-1)).otherwise(F.col("v"))
        )
    )
    assert (c1, cols1) == (100, ["k", "v"])
    assert c2 == c1 and a2 != a1  # value diff caught, count unchanged


def test_gencheck_hash_canon_unifies_exact_numerics():
    """DuckDB's Arrow reader surfaces HUGEINT aggregates as
    decimal128(38,0) where fetchall() coerces to int — the hash canon
    must land int 7, Decimal('7'), and Decimal('7.00') on one text,
    while keeping bools, floats, and non-integral decimals distinct."""
    from decimal import Decimal

    from lime_etl_spark.tools.gencheck import _canon_cell

    assert _canon_cell(7) == _canon_cell(Decimal("7")) == _canon_cell(Decimal("7.00"))
    assert _canon_cell(Decimal("7.5")) == _canon_cell(Decimal("7.50"))
    assert _canon_cell(7) != _canon_cell(Decimal("7.5"))
    assert _canon_cell(True) != _canon_cell(1)
    assert _canon_cell(7.0) != _canon_cell(7)  # float stays IEEE-hex
    assert _canon_cell(None) is None
    import datetime as dt

    naive = dt.datetime(2026, 1, 2, 3, 4, 5)
    aware = dt.datetime(2026, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)
    assert _canon_cell(naive) == _canon_cell(aware)
