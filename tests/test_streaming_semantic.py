"""Streaming (at-ingest) semantic dedup — streaming/semantic.py.

The r6 verdict's next-round #2: compose semantic_dedup(centroids=...),
the IVF persistence manifest, and the at-ingest decision-log pattern
into an incremental SemDeDup stage. Bars mirror streaming/dedup.py's:
batch-equivalence on a single drained batch, replay idempotence,
multi-batch survivor invariants, refusal composition with the saved
index, and (in test_streaming_restart.py) kill-and-restart equivalence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.ops import similarity
from lime_etl_spark.streaming import semantic as ssem
from lime_etl_spark.streaming.state import read_state_or_empty


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def cents(emb):
    return similarity.kmeans_centroids_embeddings(emb, dim=64, k=16, n_iter=5)


def test_single_batch_equals_batch_semantic_dedup(spark, sf_dir, emb, cents):
    """One availableNow drain over empty state must equal
    semantic_dedup(centroids=same) row-for-row — the upper-triangular
    batch rule is preserved within a batch, and over empty state a
    single batch IS the batch case."""
    batch_out = _rows(
        similarity.semantic_dedup(emb, dim=64, centroids=cents, threshold=0.3)
    )
    stream_out = _rows(ssem.run_ingest_batchlike(spark, sf_dir))
    assert stream_out == batch_out
    assert len(stream_out) > 0


def test_replayed_batch_is_idempotent(spark, emb, cents, tmp_path):
    """process_batch called twice with the same batch_id (the replay an
    at-least-once checkpoint produces) leaves decisions and members
    identical — partition overwrite + self-pair exclusion."""
    state = str(tmp_path / "state")
    ssem.process_batch(emb, 0, state, cents, threshold=0.3)
    d1 = _rows(
        read_state_or_empty(
            spark, os.path.join(state, ssem.DECISIONS_SUBDIR), ssem._DECISIONS_SCHEMA
        )
    )
    m1 = _rows(ssem.survivors(spark, state))
    ssem.process_batch(emb, 0, state, cents, threshold=0.3)  # replay
    d2 = _rows(
        read_state_or_empty(
            spark, os.path.join(state, ssem.DECISIONS_SUBDIR), ssem._DECISIONS_SCHEMA
        )
    )
    m2 = _rows(ssem.survivors(spark, state))
    assert d1 == d2 and m1 == m2 and len(m1) > 0


def test_multi_batch_survivor_invariants(spark, emb, cents, tmp_path):
    """Two-batch arrival: every vector decided exactly once, member ids
    unique, and ALL surviving pairs within a cell stay below the
    threshold (batch-2 survivors were pruned against batch-1 members,
    batch-mates against each other)."""
    state = str(tmp_path / "state")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    ssem.process_batch(b1, 0, state, cents, threshold=0.3)
    ssem.process_batch(b2, 1, state, cents, threshold=0.3)

    decisions = read_state_or_empty(
        spark, os.path.join(state, ssem.DECISIONS_SUBDIR), ssem._DECISIONS_SCHEMA
    )
    assert decisions.count() == emb.count()
    assert (
        decisions.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
    members = read_state_or_empty(
        spark, os.path.join(state, ssem.MEMBERS_SUBDIR), ssem._MEMBERS_SCHEMA
    )
    assert (
        members.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
    # pairwise-survivor invariant: no same-cell member pair >= threshold
    a = members.select("cluster", F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = members.select("cluster", F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    cos = F.round(
        similarity._dot(F.col("ea"), F.col("eb"))
        / (similarity._gnorm(F.col("ea")) * similarity._gnorm(F.col("eb"))),
        6,
    )
    violations = (
        a.join(b, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .filter(cos >= F.lit(0.3))
        .count()
    )
    assert violations == 0
    # and batch-2 arrivals semantically close to accepted batch-1
    # members were actually dropped against them (dup_of odd->even)
    cross = decisions.filter(
        F.col("is_dup") & (F.col("vec_id") % 2 == 1) & (F.col("dup_of") % 2 == 0)
    )
    assert cross.count() > 0


def test_centroids_from_saved_ivf_index_and_refusals(
    spark, emb, cents, tmp_path
):
    """The centroids argument composes with round-6 IVF persistence: a
    saved index path resolves through the manifest (torn/missing saves
    refuse AT ATTACH TIME, before anything commits), and the resolved
    matrix gates exactly like the in-memory one."""
    idx_dir = str(tmp_path / "ivf")
    index = similarity.ivf_index(emb, dim=64, n_clusters=16)
    index.save(idx_dir)

    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    ssem.process_batch(emb, 0, s1, idx_dir, threshold=0.3)
    ssem.process_batch(emb, 0, s2, index.cents, threshold=0.3)
    assert _rows(ssem.survivors(spark, s1)) == _rows(ssem.survivors(spark, s2))

    with pytest.raises(ValueError, match="missing manifest"):
        ssem.process_batch(
            emb, 0, str(tmp_path / "s3"), str(tmp_path / "nowhere")
        )
    import numpy as np

    with pytest.raises(ValueError, match="non-empty"):
        ssem.process_batch(
            emb, 0, str(tmp_path / "s4"), np.zeros((0, 64))
        )


def test_cross_batch_redelivery_single_decision(spark, emb, cents, tmp_path):
    """A vec_id re-delivered in a LATER batch gets no second decision
    row: one decision per vec_id ever (round-7 review finding — the
    member anti-join alone let decisions/ carry the id under two
    ingest_batch partitions)."""
    state = str(tmp_path / "state")
    b1 = emb.filter(F.col("vec_id") < 100)
    ssem.process_batch(b1, 0, state, cents, threshold=0.3)
    # batch 1 re-delivers half of batch 0 plus genuinely new vectors
    b2 = emb.filter((F.col("vec_id") < 50) | (F.col("vec_id") >= 100))
    ssem.process_batch(b2, 1, state, cents, threshold=0.3)
    decisions = read_state_or_empty(
        spark, os.path.join(state, ssem.DECISIONS_SUBDIR), ssem._DECISIONS_SCHEMA
    )
    assert decisions.count() == emb.count()
    assert (
        decisions.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
    members = read_state_or_empty(
        spark, os.path.join(state, ssem.MEMBERS_SUBDIR), ssem._MEMBERS_SCHEMA
    )
    assert (
        members.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    )
