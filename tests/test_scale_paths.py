"""Scale-path operators: salted joins, bucketed co-located joins, CSV
round-trip. These pin the mechanisms a 1000-executor deployment leans
on; results must equal the naive forms exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.io.sources import read_csv, read_table, write_bucketed_table
from lime_etl_spark.ops import analytics


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    salted = analytics.salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        key="k",
        salt=8,
    ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_splits_hot_key(spark):
    # one hot key (0) with 10k rows: the salted shuffle key must spread
    # it across multiple buckets
    left = spark.range(10_000).select(F.lit(0).alias("k"), F.col("id"))
    right = spark.createDataFrame([(0, "hot")], "k BIGINT, tag STRING")
    out = analytics.salted_join(left, right, key="k", salt=8)
    assert out.count() == 10_000
    # deterministic: same result twice
    assert out.count() == analytics.salted_join(left, right, key="k", salt=8).count()


def test_salted_join_spread_col_result_equal_and_spreads(spark):
    """spread_col salts on hash(key, spread_col) — one narrow hash
    input instead of every column of a wide row — while the join
    RESULT stays identical to the full-row-salt default (the right
    side is replicated across every bucket, so salt choice can only
    move rows, never change them). The spread itself actually happens:
    a single hot key's 10k unique event ids cover all 8 buckets."""
    n = 10_000
    left = spark.range(n).select(
        F.lit(0).alias("k"),
        F.lit("payload").alias("payload"),
        F.col("id").alias("event_id"),
    )
    right = spark.createDataFrame([(0, "hot")], "k BIGINT, tag STRING")
    a = analytics.salted_join(left, right, key="k", salt=8).collect()
    b = analytics.salted_join(
        left, right, key="k", salt=8, spread_col="event_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == n
    spread_salts = (
        left.select(F.pmod(F.xxhash64("k", "event_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert spread_salts == 8


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed_table(li, "lineitem_b", "l_orderkey", 8, sort_by="l_orderkey")
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located bucket join: NO exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == li.count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_csv_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b", 2.5), (2, None, -1.0)], "id BIGINT, s STRING, v DOUBLE"
    )
    path = str(tmp_path / "csv_out")
    df.write.option("header", "true").csv(path)
    back = read_csv(spark, path, schema="id BIGINT, s STRING, v DOUBLE")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_schema_evolution_merge_read(spark, tmp_path):
    """A table written v1 (3 cols) then v2 (adds quality_score) must
    read back as the union schema with NULLs for v1 rows — and fail
    loudly if a required column vanished (rename = contract break)."""
    import pytest as _pytest

    from lime_etl_spark.io.sources import read_evolved_parquet

    dest = str(tmp_path / "evolved")
    v1 = spark.createDataFrame(
        [(1, "a", 10)], "doc_id BIGINT, text STRING, n_tokens BIGINT"
    )
    v1.write.mode("append").parquet(dest)
    v2 = spark.createDataFrame(
        [(2, "b", 20, 0.9)],
        "doc_id BIGINT, text STRING, n_tokens BIGINT, quality_score DOUBLE",
    )
    v2.write.mode("append").parquet(dest)

    out = read_evolved_parquet(spark, dest, required=["doc_id", "quality_score"])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["quality_score"] is None
    assert rows[2]["quality_score"] == 0.9

    with _pytest.raises(ValueError, match="missing columns"):
        read_evolved_parquet(spark, dest, required=["doc_id", "renamed_away"])


def test_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """write_parquet_clustered must yield files whose min/max key
    ranges are pairwise disjoint — the property parquet data skipping
    depends on. An unclustered write of the same data fails this (every
    file spans the whole key domain)."""
    import glob

    from pyspark.sql import functions as F

    from lime_etl_spark.io.sinks import write_parquet_clustered

    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).repartition(8)  # scatter keys across input partitions first
    path = str(tmp_path / "clustered")
    write_parquet_clustered(df, path, ["k"], n_files=8)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        r = spark.read.parquet(f).agg(F.min("k"), F.max("k")).collect()[0]
        ranges.append((r[0], r[1]))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"

    # and the scan actually prunes: a tight range predicate pushes to
    # the reader with narrow file stats available
    back = spark.read.parquet(path).filter(F.col("k").between(10, 20))
    assert back.count() == 11


def test_compact_parquet_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sinks import compact_parquet

    path = str(tmp_path / "frag")
    # simulate a streaming sink's fragmentation: 40 tiny files
    spark.range(0, 40_000).withColumn("v", F.col("id") % 7).repartition(
        40
    ).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 40
    n = compact_parquet(spark, path, target_bytes=1 << 30)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n == 1
    back = spark.read.parquet(path)
    assert back.count() == 40_000
    assert back.agg(F.sum("id")).collect()[0][0] == 40_000 * 39_999 // 2


def test_compact_parquet_preserves_partition_layout(spark, tmp_path):
    """Compacting a Hive-partitioned dir (the idempotent_reload state
    layout) must KEEP the col=value directory scheme: the naive rewrite
    flattened partition values into root-level files, after which a
    replayed batch's dynamic partition overwrite (which deletes only
    its own col=N dir) left the stale rows alive — duplicated state."""
    import glob
    import os

    from pyspark.sql import functions as F

    from lime_etl_spark.io.sinks import compact_parquet, idempotent_reload

    path = str(tmp_path / "state")
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(100)], "doc_id bigint, ingest_batch bigint"
    )
    idempotent_reload(df.repartition(8), path, "ingest_batch")
    compact_parquet(spark, path, target_bytes=1 << 30)
    # partition dirs survived, no root-level data files
    assert os.path.isdir(f"{path}/ingest_batch=0")
    assert os.path.isdir(f"{path}/ingest_batch=1")
    assert glob.glob(f"{path}/part-*.parquet") == []
    assert spark.read.parquet(path).count() == 100
    # the replay contract still holds after compaction: overwriting
    # batch 0 with fewer rows leaves no stale duplicates behind
    replay = spark.createDataFrame(
        [(1000, 0)], "doc_id bigint, ingest_batch bigint"
    )
    idempotent_reload(replay, path, "ingest_batch")
    back = spark.read.parquet(path)
    assert back.filter(F.col("ingest_batch") == 0).count() == 1
    assert back.count() == 51
    # partitioned + cluster_by is refused loudly, never silently flattened
    import pytest

    with pytest.raises(ValueError, match="partitioned"):
        compact_parquet(spark, path, cluster_by=["doc_id"])


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sinks import write_orc
    from lime_etl_spark.io.sources import read_orc

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("tag")
    )
    path = str(tmp_path / "orc_out")
    write_orc(df, path, partition_by=["tag"])
    back = read_orc(spark, path)
    assert back.count() == 10_000
    filtered = back.filter(F.col("tag") == "3")
    assert filtered.count() == 2_000
    # partition pruning: only the tag=3 directory is scanned
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "tag=3" in plan or "PartitionFilters" in plan


def test_read_table_normalizes_fixture_schemas(spark):
    """read_table must yield EXACTLY the registered schema for every
    table at every SF, whatever parquet encoding the driver's fixture
    generator used this round (TIMESTAMP(NANOS)-as-long in round 1,
    TIMESTAMP(MICROS) NTZ-annotated in round 2). Catches the next
    fixture regeneration as one clear assertion instead of a deep
    AnalysisException inside whichever query touches `ts` first."""
    from lime_etl_spark import schemas

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for name, expected in schemas.TESTDATA_TABLES.items():
            got = dict(read_table(spark, f"/root/testdata/{sf}", name).dtypes)
            want = {f.name: f.dataType.simpleString() for f in expected.fields}
            assert got == want, f"{sf}/{name}: {got} != {want}"


def test_documents_fixture_ascii_nonempty(spark):
    """The multimodal_resized oracle indexes CHARACTERS while the Spark
    path indexes BYTES, so the two agree only while documents.text is
    all-ASCII and non-empty. The driver regenerates fixtures between
    rounds — this guard turns a regeneration with UTF-8 or empty docs
    into one clear failure instead of a silent oracle divergence.
    (The empty case itself is mirrored in the oracle — md5 of 64 NULs —
    so only the byte-vs-char indexing assumption truly needs ASCII.)"""
    from pyspark.sql import functions as F

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = read_table(spark, f"/root/testdata/{sf}", "documents")
        bad = docs.filter(
            F.col("text").isNull()
            | (F.length("text") == 0)
            | (F.length("text") != F.octet_length("text"))
        ).count()
        assert bad == 0, (
            f"{sf}/documents: {bad} rows with NULL/empty/non-ASCII text — "
            "the multimodal_resized char-level oracle no longer matches the "
            "byte-level Spark path; switch the oracle to byte indexing "
            "(DuckDB encode()/blob slicing) before trusting that query."
        )


def test_jsonl_corpus_read_permissive_and_strict(spark, tmp_path):
    """JSONL corpus ingest: good lines load under the documents
    contract, a malformed line surfaces as _corrupt_record in
    PERMISSIVE mode (with NULL data columns) and raises under
    strict=True."""
    import json

    import pytest

    from lime_etl_spark.io.sources import read_documents_jsonl

    path = str(tmp_path / "corpus.jsonl")
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "crawl", "n_chars": 11}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr",
                    "source": "crawl", "n_chars": 7}),
        '{"doc_id": 3, "text": "truncated...',
    ]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))

    df = read_documents_jsonl(spark, path)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].text == "hello world" and rows[2].lang == "fr"
    assert rows[1]._corrupt_record is None
    bad = [r for r in rows.values() if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].text is None

    with pytest.raises(ValueError, match="1 corrupt line"):
        read_documents_jsonl(spark, path, strict=True)


def test_zordered_write_compacts_both_dimensions(spark, tmp_path):
    """Z-order clustering must keep BOTH columns' per-file min/max
    ranges narrow (that is its whole point); single-key range
    clustering narrows the sort column and leaves the other spanning
    ~the full domain in every file."""
    import glob

    from lime_etl_spark.io.sinks import write_parquet_clustered, write_parquet_zordered

    # two independent uniform dims (id bits decorrelated via multiplier)
    df = spark.range(0, 65_536).selectExpr(
        "id AS x", "CAST((id * 2654435761) % 65536 AS BIGINT) AS y"
    ).repartition(8)

    def avg_file_span(path, col, domain=65_535.0):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            r = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
            spans.append((r[1] - r[0]) / domain)
        assert len(spans) >= 8
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "zordered")
    write_parquet_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    rpath = str(tmp_path / "ranged")
    write_parquet_clustered(df, rpath, ["x"], n_files=16)

    # single-key clustering: x narrow, y spans everything
    assert avg_file_span(rpath, "x") < 0.1
    assert avg_file_span(rpath, "y") > 0.9
    # z-order: both dims compact enough to prune (16 files over a
    # 2-D grid -> each file covers ~1/4 of each axis)
    assert avg_file_span(zpath, "x") < 0.5
    assert avg_file_span(zpath, "y") < 0.5
    # and nothing was lost or duplicated
    assert spark.read.parquet(zpath).count() == 65_536


def test_zorder_key_property_vs_python_reference(spark):
    """zorder_bucket + zorder_key == a direct Python reimplementation
    (integer bucket then bit interleave) over random int domains,
    including constant columns and span edge cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lime_etl_spark.ops.analytics import zorder_bucket, zorder_key

    def py_bucket(x, lo, hi, bits):
        if hi == lo:
            return 0
        return (x - lo) * ((1 << bits) - 1) // (hi - lo)

    def py_key(buckets, bits):
        key = 0
        for j, b in enumerate(buckets):
            for i in range(bits):
                key |= ((b >> i) & 1) << (i * len(buckets) + j)
        return key

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=-(10**6), max_value=10**6),
                st.integers(min_value=0, max_value=10**9),
            ),
            min_size=1,
            max_size=30,
        ),
        bits=st.sampled_from([4, 8, 16]),
    )
    def check(rows, bits):
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)], "i BIGINT, x BIGINT, y BIGINT"
        )
        stats = df.agg(
            F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
        )
        bx = zorder_bucket("x", "x_lo", "x_hi", bits)
        by = zorder_bucket("y", "y_lo", "y_hi", bits)
        got = {
            r.i: r.z
            for r in df.crossJoin(F.broadcast(stats))
            .select("i", zorder_key([bx, by], bits).alias("z"))
            .collect()
        }
        xs, ys = [x for x, _ in rows], [y for _, y in rows]
        for i, (x, y) in enumerate(rows):
            want = py_key(
                [py_bucket(x, min(xs), max(xs), bits),
                 py_bucket(y, min(ys), max(ys), bits)],
                bits,
            )
            assert got[i] == want, (i, x, y, got[i], want)

    check()


def test_zordered_write_validates_bits_budget_at_entry(spark, tmp_path):
    """A 4-column cluster_by at the default bits=16 needs 64 interleaved
    bits — one more than a signed long holds. That must fail AT THE API
    BOUNDARY with a message naming the bits parameter and the fix, not
    deep inside zorder_key."""
    import pytest

    from lime_etl_spark.io.sinks import write_parquet_zordered

    df = spark.range(10).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError, match=r"bits=15"):
        write_parquet_zordered(df, str(tmp_path / "z"), ["a", "b", "c", "d"])
    with pytest.raises(ValueError, match="at least one cluster_by"):
        write_parquet_zordered(df, str(tmp_path / "z"), [])
    # auto-suggested budget works end-to-end
    write_parquet_zordered(
        df, str(tmp_path / "z_ok"), ["a", "b", "c", "d"], bits=15, n_files=1
    )
    assert spark.read.parquet(str(tmp_path / "z_ok")).count() == 10


def test_skew_report_and_stats(spark):
    from lime_etl_spark.tools import skew

    rows = [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    top = skew.key_histogram(df, ["k"], top_k=2).collect()
    assert [(r["k"], r["n_rows"], r["share"]) for r in top] == [
        (1, 80, 0.8), (2, 15, 0.15)
    ]
    st = skew.skew_stats(df, ["k"])
    assert (st.n_rows, st.n_keys, st.max_key_rows) == (100, 3, 80)
    assert abs(st.skew_factor - 80 / (100 / 3)) < 1e-9
    assert st.recommended_salt(target_rows_per_task=10) == 8
    assert st.recommended_salt() == 1  # tiny data: no salting
    # plan: one hash aggregate on the key, top-k via TakeOrdered
    plan = skew.key_histogram(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # skew_report: both halves from ONE key aggregate, same answers as
    # the separate calls (the CLI used to scan the table twice)
    st2, top2 = skew.skew_report(df, ["k"], top_k=2)
    assert st2 == st
    assert [(r["k"], r["n_rows"], r["share"]) for r in top2] == [
        (1, 80, 0.8), (2, 15, 0.15)
    ]


def test_ensure_parallelism_remote_inputs_never_repartitioned(spark, sf_dir):
    """Inputs on remote storage can't be sized from the driver's local
    filesystem; they used to read as size 0 = 'tiny' and get a blind
    full-table repartition — the exact catastrophic outcome the size
    check exists to prevent. Any non-file: URI now makes the helper a
    NO-OP."""
    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops.util import ensure_parallelism

    df = read_table(spark, sf_dir, "orders")
    df.inputFiles = lambda: ["s3a://bucket/warehouse/orders/part-0.parquet"]
    assert ensure_parallelism(df) is df
    # local small scan still spreads
    small = read_table(spark, sf_dir, "region")
    out = ensure_parallelism(small, min_partitions=4)
    assert out is not small
    assert out.rdd.getNumPartitions() == 4


def test_compact_parquet_works_on_uri_paths(spark, tmp_path):
    """Round 6: compaction must work on URI paths (hdfs://, s3a://,
    file://) — the os.walk/shutil form silently worked only on bare
    local paths, the same local-only defect class the r5 review caught
    in manifest IO. file:// exercises the Hadoop FS code path."""
    from lime_etl_spark.io.sinks import compact_parquet

    path = str(tmp_path / "t")
    spark.range(10000).repartition(8).write.parquet(path)
    n = compact_parquet(spark, "file://" + path, target_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(path).count() == 10000


def test_read_csv_keep_corrupt_rejects_schema_conflict(spark):
    """keep_corrupt=True appends _corrupt_record itself; a schema that
    already declares it must fail HERE with a named conflict, not as a
    duplicate-column AnalysisException deep inside the reader
    (round-6 advice: io/sources.py:132)."""
    import pytest

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_csv(
            spark, "/tmp/nonexistent.csv",
            schema="id BIGINT, _corrupt_record STRING",
            keep_corrupt=True,
        )


def test_scale_rehearsal_never_wipes_foreign_dirs(spark, tmp_path):
    """_ensure_generated must not rmtree a directory it cannot positively
    identify as datagen output (round-6 advice: tools/scale_rehearsal.py:59):
    foreign content → refusal; complete legacy output → adopted via marker."""
    import os

    import pytest

    from lime_etl_spark.tools import datagen
    from lime_etl_spark.tools.scale_rehearsal import _ensure_generated

    # foreign content → hard refusal, nothing deleted
    foreign = tmp_path / "sf7"
    foreign.mkdir()
    (foreign / "my_thesis.docx").write_text("precious")
    with pytest.raises(RuntimeError, match="refusing to wipe"):
        _ensure_generated(spark, 7.0, str(tmp_path))
    assert (foreign / "my_thesis.docx").read_text() == "precious"

    # complete legacy output (all tables + _SUCCESS, no marker) → adopted
    legacy = tmp_path / "sf8"
    for t in datagen.GENERATORS:
        d = legacy / f"{t}.parquet"
        d.mkdir(parents=True)
        (d / "_SUCCESS").write_text("")
        (d / "part-00000.parquet").write_text("stub")
    out = _ensure_generated(spark, 8.0, str(tmp_path))
    assert out == str(legacy)
    assert os.path.exists(legacy / "_GENERATED")
    # the stub data survived — adoption, not regeneration
    assert (legacy / "lineitem.parquet" / "part-00000.parquet").read_text() == "stub"


def test_read_csv_corrupt_guard_matches_column_names_not_substrings(spark, tmp_path):
    """A column merely CONTAINING '_corrupt_record' must pass the
    keep_corrupt conflict guard (round-7 review finding: the raw
    substring test falsely rejected valid schemas)."""
    p = tmp_path / "t.csv"
    p.write_text("id,raw_corrupt_record\n1,ok\nbad-row-with,too,many,fields\n")
    df = read_csv(
        spark, str(p),
        schema="id BIGINT, raw_corrupt_record STRING",
        keep_corrupt=True,
    )
    assert "_corrupt_record" in df.columns
    rows = df.collect()
    assert any(r["_corrupt_record"] is not None for r in rows)
