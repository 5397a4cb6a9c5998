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
