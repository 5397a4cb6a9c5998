"""Structured Streaming tests (SURVEY.md §5.4): bounded availableNow
runs whose final state must equal the batch twin."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.streaming import events as sevents


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    got = sevents.run_to_memory(
        sevents.tumbling_counts(stream), checkpoint_dir=str(tmp_path / "ck1")
    )
    batch = read_table(spark, sf_dir, "events").groupBy(
        "event_type", F.window("ts", "5 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2).cast("double").alias("total_value"),
    ).select(
        "event_type", F.col("w.start").alias("bucket_start"), "n_events", "total_value"
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_streaming_session_windows(spark, sf_dir, tmp_path):
    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    got = sevents.run_to_memory(
        sevents.session_windows(stream, gap="30 minutes"),
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    rows = got.collect()
    assert len(rows) > 0
    # session invariants: start <= end, n_events >= 1
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # total events across sessions == table size
    total = sum(r.n_events for r in rows)
    assert total == read_table(spark, sf_dir, "events").count()


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    got = sevents.run_to_memory(
        sevents.dedup_within_watermark(stream),
        checkpoint_dir=str(tmp_path / "ck3"),
        output_mode="append",
    )
    n = got.count()
    assert n == read_table(spark, sf_dir, "events").count()  # event_id already unique


def test_foreach_batch_idempotent_sink(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "wh")
    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    enriched = stream.withColumn("load_date", F.to_date("ts"))
    sevents.run_foreach_batch_idempotent(
        enriched, dest, "load_date", str(tmp_path / "ck4")
    )
    n1 = spark.read.parquet(dest).count()
    # re-run with a FRESH checkpoint (simulates redelivery of the same
    # batch): dynamic partition overwrite must not duplicate rows
    sevents.run_foreach_batch_idempotent(
        enriched, dest, "load_date", str(tmp_path / "ck5")
    )
    n2 = spark.read.parquet(dest).count()
    assert n1 == n2 == read_table(spark, sf_dir, "events").count()
    # partition layout is real (load_date=... dirs)
    assert any(d.startswith("load_date=") for d in os.listdir(dest))


def test_sliding_windows_overlap(spark, sf_dir, tmp_path):
    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    got = sevents.run_to_memory(
        sevents.sliding_counts(stream, window="10 minutes", slide="5 minutes"),
        checkpoint_dir=str(tmp_path / "ck6"),
    )
    rows = got.collect()
    assert len(rows) > 0
    # each event lands in 2 overlapping windows → sum of counts == 2x events
    total = sum(r.n_events for r in rows)
    assert total == 2 * read_table(spark, sf_dir, "events").count()
