"""The object-store commit window, OBSERVED (round-6 verdict task 1).

The resumable pipeline's write-then-publish manifests claim safety on
stores without atomic rename ("a crashed publish is simply re-done").
Every prior test ran on RawLocalFileSystem, which HAS atomic rename —
the claim was argued from semantics, never executed. These tests run
the pipeline on ``S3LikeFS`` (io/fsutil.py): rename = copy-then-delete
through the same Hadoop API, with a crash injected at every point of
the window, plus delayed listing visibility. The gate for each failure
mode is artifact EQUALITY with an uninterrupted run — not just "does
not crash".

Also covers the job-level torn-write artifacts the shim cannot reach
(Spark's own committers own those renames): a stage parquet directory
or an ``idempotent_reload`` partition left with a SUBSET of part files
plus a stray file from a dead attempt — the re-run must converge to
the clean result.
"""

from __future__ import annotations

import os

import pytest

from lime_etl_spark.io.fsutil import HadoopFS, InjectedCrash, S3LikeFS
from lime_etl_spark.pipelines.corpus import (
    _MANIFEST,
    prepare_training_corpus_resumable,
)

BUDGET = 256


def _run(spark, sf_dir, out, fs=None, **kw):
    return prepare_training_corpus_resumable(
        spark, sf_dir, str(out), budget=BUDGET, stage_fs=fs, **kw
    )


def _artifacts(spark, out) -> "tuple[list, list]":
    train = sorted(
        map(tuple, spark.read.parquet(str(out) + "/train").collect())
    )
    evald = sorted(map(tuple, spark.read.parquet(str(out) + "/eval").collect()))
    return train, evald


@pytest.fixture(scope="module")
def clean_run(spark, sf_dir, tmp_path_factory):
    """The uninterrupted twin every failure mode is compared against."""
    out = tmp_path_factory.mktemp("clean")
    counts = _run(spark, sf_dir, out)
    return counts, _artifacts(spark, out)


@pytest.mark.slow
def test_crash_before_copy_reads_not_done_and_resumes_exact(
    spark, sf_dir, tmp_path, clean_run
):
    """Crash at the start of the rename window: tmp written, destination
    never appears. The stage must read as NOT DONE and resume must
    recompute it to artifacts identical to the uninterrupted run."""
    out = tmp_path / "out"
    shim = S3LikeFS(spark, str(out), crash="before_copy", crash_on_rename=1)
    with pytest.raises(InjectedCrash):
        _run(spark, sf_dir, out, fs=shim)
    stage = out / "_stages" / "filtered"
    assert (stage / (_MANIFEST + ".tmp")).exists()  # orphaned tmp
    assert not (stage / _MANIFEST).exists()  # publish never landed
    resumed = _run(spark, sf_dir, out, fs=S3LikeFS(spark, str(out)))
    assert "filtered" in resumed["stages_computed"]  # re-done, not half-read
    clean_counts, clean_art = clean_run
    assert {k: v for k, v in resumed.items() if k.startswith("n_")} == {
        k: v for k, v in clean_counts.items() if k.startswith("n_")
    }
    assert _artifacts(spark, out) == clean_art


@pytest.mark.slow
def test_crash_mid_copy_torn_manifest_resumes_exact(
    spark, sf_dir, tmp_path, clean_run
):
    """Crash mid-copy: the manifest EXISTS but is torn (truncated JSON).
    This is the harshest store model — and it found a real bug: the r5
    loader raised JSONDecodeError here, wedging every subsequent resume
    until the torn file was hand-deleted. Torn must read as 'not done'."""
    out = tmp_path / "out"
    shim = S3LikeFS(spark, str(out), crash="mid_copy", crash_on_rename=1)
    with pytest.raises(InjectedCrash):
        _run(spark, sf_dir, out, fs=shim)
    stage = out / "_stages" / "filtered"
    torn = (stage / _MANIFEST).read_bytes()
    assert torn  # destination is visible...
    with pytest.raises(ValueError):
        import json

        json.loads(torn)  # ...but torn
    resumed = _run(spark, sf_dir, out, fs=S3LikeFS(spark, str(out)))
    assert "filtered" in resumed["stages_computed"]
    assert _artifacts(spark, out) == clean_run[1]


def test_crash_after_copy_stage_is_done_and_reused(
    spark, sf_dir, tmp_path, clean_run
):
    """Crash between the copy and the source delete: the destination is
    complete (the publish LANDED), the tmp is an orphan. Resume must
    REUSE the stage — and the orphan (underscore-prefixed) must not
    break the stage parquet read."""
    out = tmp_path / "out"
    shim = S3LikeFS(spark, str(out), crash="after_copy", crash_on_rename=1)
    with pytest.raises(InjectedCrash):
        _run(spark, sf_dir, out, fs=shim)
    stage = out / "_stages" / "filtered"
    assert (stage / _MANIFEST).exists()
    assert (stage / (_MANIFEST + ".tmp")).exists()  # orphaned source
    resumed = _run(spark, sf_dir, out, fs=S3LikeFS(spark, str(out)))
    assert "filtered" in resumed["stages_reused"]  # complete publish honored
    assert _artifacts(spark, out) == clean_run[1]


def test_crash_in_later_stage_publish_reuses_upstream(
    spark, sf_dir, tmp_path, clean_run
):
    """Crash in the SECOND stage's publish: stage 1 stays done and is
    reused; only the torn stage recomputes."""
    out = tmp_path / "out"
    shim = S3LikeFS(spark, str(out), crash="mid_copy", crash_on_rename=2)
    with pytest.raises(InjectedCrash):
        _run(spark, sf_dir, out, fs=shim)
    resumed = _run(spark, sf_dir, out, fs=S3LikeFS(spark, str(out)))
    assert "filtered" in resumed["stages_reused"]
    assert "survivors" in resumed["stages_computed"]
    assert _artifacts(spark, out) == clean_run[1]


@pytest.mark.slow
def test_delayed_listing_republish_is_idempotent(
    spark, sf_dir, tmp_path, clean_run
):
    """Eventually-consistent listing: a resume whose exists() probes miss
    the published manifests recomputes and REPUBLISHES every stage —
    wasteful, never wrong (stage determinism makes the republish
    byte-equal). This is the 'a crashed publish is simply re-done'
    claim generalized to invisible publishes."""
    out = tmp_path / "out"
    _run(spark, sf_dir, out)  # complete run, all manifests published
    stale = S3LikeFS(spark, str(out), list_delay=3)
    resumed = _run(spark, sf_dir, out, fs=stale)
    # every stage recomputed (listings lied), result still exact
    assert resumed["stages_reused"] == []
    assert set(resumed["stages_computed"]) == {"filtered", "survivors", "clean"}
    assert _artifacts(spark, out) == clean_run[1]
    # and a fresh consistent reader now reuses everything
    again = _run(spark, sf_dir, out)
    assert again["stages_computed"] == []


def test_torn_stage_parquet_without_manifest_recomputes(
    spark, sf_dir, tmp_path, clean_run
):
    """Job-level torn write: a crashed stage job can leave a SUBSET of
    final-named part files (s3a classic committer renames per-file) and
    strays from dead attempts — with NO manifest. Must read as not done;
    the recompute must clear the remnants, not merge with them."""
    out = tmp_path / "out"
    _run(spark, sf_dir, out, stop_after="filtered")
    stage = out / "_stages" / "filtered"
    (stage / _MANIFEST).unlink()  # crash happened before publish
    parts = sorted(p for p in stage.iterdir() if p.name.endswith(".parquet"))
    assert parts, "expected part files"
    parts[0].unlink()  # a part that never got renamed in
    # a stray part file from a dead attempt (would corrupt a merge-read)
    (stage / "part-99999-dead-attempt.c000.snappy.parquet").write_bytes(b"junk")
    resumed = _run(spark, sf_dir, out)
    assert "filtered" in resumed["stages_computed"]
    assert not (stage / "part-99999-dead-attempt.c000.snappy.parquet").exists()
    assert _artifacts(spark, out) == clean_run[1]


def test_idempotent_reload_rerun_converges_after_torn_partition(spark, tmp_path):
    """K4-K6 re-run safety at the job level: tear one partition of an
    idempotent_reload destination (drop a part file, add a stray from a
    dead attempt) and re-run the same load — dynamic partition
    overwrite must converge the torn partition back to the clean state."""
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sinks import idempotent_reload

    df = (
        spark.range(200)
        .select(
            F.col("id"),
            (F.col("id") % 4).cast("int").alias("bucket"),
            (F.col("id") * 3).alias("v"),
        )
    )
    dest = str(tmp_path / "reload")
    idempotent_reload(df, dest, "bucket")
    clean = sorted(map(tuple, spark.read.parquet(dest).collect()))
    part_dir = os.path.join(dest, "bucket=1")
    parts = sorted(
        f for f in os.listdir(part_dir) if f.endswith(".parquet")
    )
    assert parts
    os.unlink(os.path.join(part_dir, parts[0]))
    with open(
        os.path.join(part_dir, "part-99999-dead-attempt.c000.snappy.parquet"), "wb"
    ) as fh:
        fh.write(b"junk")
    idempotent_reload(df, dest, "bucket")
    assert sorted(map(tuple, spark.read.parquet(dest).collect())) == clean


@pytest.mark.slow
def test_out_of_band_corrupt_manifest_recomputes_not_wedges(
    spark, sf_dir, tmp_path, clean_run
):
    """A manifest made unreadable OUT OF BAND (here: a plain-Python
    overwrite leaves Hadoop's checksummed local FS with a stale .crc,
    so the Hadoop-API read raises ChecksumException inside a
    Py4JJavaError; the bytes are torn JSON besides) must read as 'not
    done' and recompute — NOT wedge every resume until the file is
    hand-deleted. The S3LikeFS torn-manifest test cannot catch this
    class: the shim writes its torn bytes through the Hadoop API,
    keeping the checksum consistent."""
    out = tmp_path / "out"
    _run(spark, sf_dir, out)
    with open(str(out / "_stages" / "survivors" / _MANIFEST), "w") as fh:
        fh.write('{"fingerprint": "')
    resumed = _run(spark, sf_dir, out)
    assert "survivors" in resumed["stages_computed"]  # recomputed, no wedge
    clean_counts, clean_art = clean_run
    assert {k: v for k, v in resumed.items() if k.startswith("n_")} == {
        k: v for k, v in clean_counts.items() if k.startswith("n_")
    }
    assert _artifacts(spark, out) == clean_art


def test_s3likefs_is_hadoopfs_on_the_happy_path(spark, tmp_path):
    """No crash armed: the shim's copy-then-delete publish must be
    byte-equivalent to the atomic-rename base class."""
    a = HadoopFS(spark, str(tmp_path))
    b = S3LikeFS(spark, str(tmp_path))
    pa, pb = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    payload = {"fingerprint": "abc", "rows": 7}
    a.write_json_atomic(pa, payload)
    b.write_json_atomic(pb, payload)
    assert a.read_json(pa) == b.read_json(pb) == payload
    assert not os.path.exists(pb + ".tmp")  # source deleted after copy
