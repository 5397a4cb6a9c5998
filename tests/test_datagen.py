"""Scale-rehearsal generator: schema parity with the driver fixture and
pure-hash determinism (partition-layout invariance)."""

from __future__ import annotations

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.tools import datagen

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_generated_schema_matches_fixture(spark, sf_dir, tmp_path):
    out = str(tmp_path / "gen")
    datagen.generate(spark, 0.001, out)
    for name in ALL_TABLES:
        fixture = read_table(spark, sf_dir, name)
        gen = read_table(spark, out, name)
        assert [(f.name, f.dataType.simpleString()) for f in gen.schema.fields] == [
            (f.name, f.dataType.simpleString()) for f in fixture.schema.fields
        ], f"schema drift vs fixture for {name}"


def test_generation_is_partition_invariant(spark):
    """Every cell is a closed-form hash of the row id, so regenerating
    under a different partition layout must produce identical bytes."""
    a = datagen.gen_documents(spark, 0.001).repartition(7)
    b = datagen.gen_documents(spark, 0.001).coalesce(1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_documents_have_controlled_duplicates(spark):
    docs = datagen.gen_documents(spark, 0.01)
    total = docs.count()
    distinct_texts = docs.select("text").distinct().count()
    # exact dups (~0.8%) collapse some texts
    assert distinct_texts < total
    assert total - distinct_texts < total * 0.05


def test_lineitem_fanout_and_integrity(spark):
    orders = datagen.gen_orders(spark, 0.001)
    li = datagen.gen_lineitem(spark, 0.001)
    n_orders, n_li = orders.count(), li.count()
    # avg 4 lines/order within tolerance
    assert 3.5 <= n_li / n_orders <= 4.5
    # referential integrity by construction
    orphans = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    assert orphans.count() == 0


def test_scale_rehearsal_sf_dir_resolution(tmp_path):
    """Fixture SFs resolve to the read-only driver directory; anything
    else lands under the caller's workdir (never /root/testdata)."""
    from lime_etl_spark.tools.scale_rehearsal import _sf_dir

    assert _sf_dir(0.1, str(tmp_path)) == "/root/testdata/sf0.1"
    assert _sf_dir(0.001, str(tmp_path)) == "/root/testdata/sf0.001"
    assert _sf_dir(1.0, str(tmp_path)) == str(tmp_path / "sf1")
    assert _sf_dir(4.0, str(tmp_path)) == str(tmp_path / "sf4")


def test_scale_rehearsal_rejects_executor_mem_without_master():
    """--executor-mem on a plain local[N] rehearsal is a silent no-op
    (there are no separate executors) — _session must reject it rather
    than let the user believe the memory cap was applied (r4 ADVICE)."""
    import pytest

    from lime_etl_spark.tools.scale_rehearsal import _session

    with pytest.raises(ValueError, match="--executor-mem"):
        _session("x", None, None, executor_mem="4g")


def test_open_vocab_documents_deterministic_and_planted(spark):
    from pyspark.sql import functions as F

    from lime_etl_spark.tools import datagen

    a = datagen.gen_documents_open(spark, 500)
    b = datagen.gen_documents_open(spark, 500)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # vocabulary is open: far more distinct tokens than the fixture's 31
    n_tokens = (
        a.select(F.explode(F.split("text", " ")).alias("t"))
        .select(F.countDistinct("t"))
        .collect()[0][0]
    )
    assert n_tokens > 1000
    # planted exact duplicates exist (hash%125==7 ids copy an earlier doc)
    dup_texts = a.groupBy("text").count().filter("count > 1").count()
    assert dup_texts > 0


def test_generated_events_value_matches_fixture_distribution(spark, sf_dir):
    """Generated event values must be distribution-matched to the
    fixture (exponential, mean ~50): the old pow(u,2)*600 had mean
    ~200, so generated-vs-fixture scale comparisons on any
    value-aggregating query mixed incomparable distributions."""
    from pyspark.sql import functions as F

    gen = datagen.gen_events(spark, 0.1)
    g = gen.agg(
        F.avg("value").alias("mean"),
        F.expr("percentile(value, 0.5)").alias("q50"),
        F.expr("percentile(value, 0.9)").alias("q90"),
    ).collect()[0]
    # Exp(50): mean 50, q50 34.66, q90 115.1 (fixture: 49.9/34.8/114.3)
    assert abs(g["mean"] - 50) < 3, g
    assert abs(g["q50"] - 34.7) < 3, g
    assert abs(g["q90"] - 115) < 8, g


def test_scale_rehearsal_regenerates_partial_dirs(spark, tmp_path):
    """A generation killed mid-write leaves a directory without the
    _GENERATED marker: the rehearsal must wipe and regenerate it, not
    silently time queries against partial data; a COMPLETE dir (marker
    present) is reused untouched."""
    import os

    from lime_etl_spark.tools.scale_rehearsal import _ensure_generated

    wd = str(tmp_path)
    # simulate a crashed generation: directory exists, no marker
    partial = os.path.join(wd, "sf1e-05")
    os.makedirs(partial)
    with open(os.path.join(partial, "orders.parquet"), "w") as fh:
        fh.write("torn")
    sdir = _ensure_generated(spark, 0.00001, wd)
    assert sdir == partial
    assert os.path.exists(os.path.join(sdir, "_GENERATED"))
    assert spark.read.parquet(os.path.join(sdir, "orders.parquet")).count() > 0
    # complete dir: reused, not regenerated (marker mtime unchanged)
    marker = os.path.join(sdir, "_GENERATED")
    before = os.path.getmtime(marker)
    assert _ensure_generated(spark, 0.00001, wd) == sdir
    assert os.path.getmtime(marker) == before
