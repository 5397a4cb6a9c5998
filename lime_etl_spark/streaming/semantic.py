"""Incremental semantic dedup on ingest (streaming SemDeDup).

Batch semantic dedup (ops/similarity.semantic_dedup, Abbas et al. 2023)
answers "which embeddings in THIS corpus are semantic near-copies"; an
ingest pipeline needs the online form: vectors arrive continuously and
each new one must be pruned against everything already ACCEPTED in its
k-means cell — without re-scoring the corpus. This composes the pieces
round 6 built (r6 verdict next-round #2): a SAVED clustering (an
IVFIndex path or a centroid matrix — ``semantic_dedup(centroids=...)``'s
contract), and streaming/dedup.py's at-ingest decision-log pattern.

Design (foreachBatch over an embedding stream):

1. The CLUSTERING is fixed at attach time — load from a persisted
   IVFIndex (write-then-publish manifest, stale-corpus refusal) or pass
   the matrix. Cells must be stable across batches or "same cell"
   loses meaning; retrain + rebuild the state to re-cluster.
2. Accumulated state = the accepted members per cell:
   (vec_id, cluster, cent_cos, e) — the vectors themselves, since
   pruning needs exact cosine against kept members (unlike the LSH
   gate, whose state is a band index smaller than the corpus; here the
   state IS the surviving corpus, which production keeps anyway).
3. Per micro-batch: assign new vectors to cells (Arrow argmax kernel,
   the IVF assignment), rank batch-mates by the batch rule
   (cent_cos asc for keep='farthest', ties by id). A new vector is a
   duplicate iff cosine >= threshold against ANY state member of its
   cell, or against ANY higher-priority batch-mate (kept or dropped —
   the paper's upper-triangular rule, so a single-batch drain over
   empty state equals batch semantic_dedup row-for-row; pinned in
   tests). ``dup_of`` = the highest-cosine such neighbor (ties: lowest
   id), ``best_cos`` its score.
4. Exactly-once: decisions and member appends are dynamic partition
   overwrites keyed on the micro-batch id (io/sinks.idempotent_reload)
   — a replayed batch rewrites its own partitions. The state join
   excludes self-pairs (replayed docs are already members), and a
   vec_id re-delivered in a LATER batch is never re-appended to the
   member state (left_anti on existing member ids), so member ids stay
   unique.

Departure from batch semantics, inherent to at-ingest dedup: a vector
DROPPED in an earlier batch cannot veto later arrivals (only accepted
members persist), whereas the batch rule lets any higher-priority
vector veto. Arrival order is the priority between batches; the batch
rule holds within each batch. Same trade as the LSH ingest gate.
The batch decomposition itself is part of that arrival order and is
NOT crash-stable: a driver killed between the file-source's per-batch
log write and the engine's offsets-WAL write makes the restarted
stream merge the orphaned file set with the next batch (Spark file
source semantics). Decisions computed under the merged arrival order
are valid; exactly-once and no-loss hold regardless (pinned by
tests/test_streaming_restart.py's decomposition-aware equivalence).

Scale posture: everything is keyed on cluster — the new batch (small)
joins members (large but partitionable by cluster); in-cell cost is
|batch_cell| x |member_cell|, the IVF search regime; grow n_clusters
with the corpus. No driver state beyond the k*dim centroid matrix.
The cross-batch re-delivery guard is amortized
(streaming/state.DecisionIdGuard): decided ids are read from disk once
per process/session and extended in memory — per-batch disk cost is
one partition listing, not an O(state) scan
(LIME_REDELIVERY_GUARD=disk restores the per-batch read for
differential testing). Executor-loss caveat: the pins and the guard
use localCheckpoint, which is not recomputable after executor loss —
a dead executor fails the micro-batch and recovery is the foreachBatch
replay (see streaming/dedup.py's module notes; same trade).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from lime_etl_spark.plans import auto_broadcast

from lime_etl_spark.io import sinks
from lime_etl_spark.ops.similarity import (
    _assign_cluster,
    _dot,
    _gnorm,
    _to_double,
)
from lime_etl_spark.streaming.state import _Pin, decision_guard
from lime_etl_spark.streaming.state import read_state_or_empty as _read_or_empty

MEMBERS_SUBDIR = "members"
DECISIONS_SUBDIR = "decisions"

_MEMBERS_SCHEMA = (
    "vec_id bigint, cluster int, cent_cos double, e array<double>, "
    "ingest_batch bigint"
)
_DECISIONS_SCHEMA = (
    "vec_id bigint, is_dup boolean, dup_of bigint, best_cos double, "
    "cluster int, ingest_batch bigint"
)


def _resolve_centroids(spark: SparkSession, centroids) -> np.ndarray:
    """A numpy matrix passes through; a string loads a persisted
    IVFIndex (manifest-published, so a save that died mid-write refuses
    here rather than clustering against torn centroids)."""
    if isinstance(centroids, str):
        from lime_etl_spark.ops.similarity import ivf_index_load

        centroids = ivf_index_load(spark, centroids).cents
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.ndim != 2 or cents.shape[0] == 0:
        raise ValueError(
            "streaming semantic dedup needs a non-empty (k, dim) centroid "
            f"matrix; got shape {cents.shape} — train with "
            "kmeans_centroids_embeddings/ivf_index first"
        )
    return cents


def process_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    centroids,
    threshold: float = 0.3,
    keep: str = "farthest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of incremental semantic dedup — module docstring.

    Pure function of (batch, accumulated state, centroids); safe to
    replay: both writes are partition overwrites keyed on batch_id.
    """
    if keep not in ("farthest", "closest"):
        raise ValueError(f"keep must be 'farthest' or 'closest', got {keep!r}")
    spark = batch.sparkSession
    cents = _resolve_centroids(spark, centroids)

    # collapse intra-batch duplicate ids deterministically (at-least-once
    # sources can deliver one id twice per batch; the winner must not
    # depend on arrival order or replays diverge)
    new = (
        batch.select(
            F.col(id_col).alias("vec_id"), _to_double(F.col(vec_col)).alias("e")
        )
        .groupBy("vec_id")
        .agg(F.min_by("e", F.xxhash64(F.col("e"))).alias("e"))
    )
    assigned = _assign_cluster(new, cents, "e")
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster int, ce array<double>",
    )
    cent_cos = F.round(
        _dot(F.col("e"), F.col("ce")) / (_gnorm(F.col("e")) * _gnorm(F.col("ce"))),
        9,
    )
    asc = keep == "farthest"
    order = [
        F.col("cent_cos").asc() if asc else F.col("cent_cos").desc(),
        F.col("vec_id").asc(),
    ]
    ranked = (
        # bounded by contract: one row per cluster (n_clusters arg)
        assigned.join(auto_broadcast(cdf, bounded=True), "cluster", "left")
        .select("vec_id", "cluster", "e", cent_cos.alias("cent_cos"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("cluster").orderBy(*order))
        )
        # cached for the batch: decisions + member append + the two
        # candidate joins below would otherwise re-run the Arrow
        # assignment kernel ~4x; unpersisted in the finally
        .cache()
    )
    try:
        _process_batch_inner(spark, ranked, batch_id, state_dir, threshold)
    finally:
        ranked.unpersist()


def _process_batch_inner(spark, ranked, batch_id, state_dir, threshold) -> None:
    # REPLAY idempotence is subtler than the self-pair exclusion alone:
    # on a replayed batch the state already holds this batch's first-
    # attempt SURVIVORS, so a replayed vector x also pairs (via
    # vs_state) with lower-priority batch-mates that survived — pairs
    # the upper-triangular batch rule never scores. Those pairs cannot
    # veto x because survivors are pairwise BELOW the threshold by
    # construction (if cos(a,b) >= t the lower-priority one was
    # dropped), so the replayed decisions are identical — pinned by
    # test_replayed_batch_is_idempotent.
    members = _read_or_empty(
        spark, os.path.join(state_dir, MEMBERS_SUBDIR), _MEMBERS_SCHEMA
    ).drop("ingest_batch")

    # one decision per vec_id EVER: a vec_id re-delivered in a LATER
    # batch (cross-batch at-least-once delivery) must not get a second
    # decision row — the member-state anti-join alone protected only
    # the members invariant, while decisions/ would carry the id under
    # two ingest_batch partitions (round-7 review finding). Prior
    # decisions from OTHER batches exclude the re-delivery; the current
    # batch's own partition is about to be overwritten (replay-safe).
    # Round 9: the read is amortized through the decided-id guard
    # (module docstring); LIME_REDELIVERY_GUARD=disk keeps the round-8
    # per-batch read as the differential twin.
    decisions_path = os.path.join(state_dir, DECISIONS_SUBDIR)
    # every mode routes through DecisionIdGuard (round-10): disk — and
    # auto before its measured crossover — reproduces the round-8
    # per-batch read INSIDE the guard; cached/sharded (and auto past
    # crossover) use the amortized broadcast probe + increment joins.
    guard = decision_guard(decisions_path, "vec_id")
    ranked = guard.filter_prior(ranked, batch_id)

    # pin the guarded batch ONCE (round-10 advice): the two pair joins,
    # the decisions build, and the member append all consume `ranked` —
    # unpinned, each re-executes the guard's Arrow probe and the
    # per-increment anti-joins (~4x per micro-batch), and in disk mode
    # re-scans the decisions dir this very batch overwrites. Mirrors
    # dedup.py's _Pin(guarded); batch-sized, released in the finally.
    ranked_pin = _Pin(ranked)
    ranked = ranked_pin.df
    pins = [ranked_pin]

    pair_cos = F.round(
        _dot(F.col("ea"), F.col("eb")) / (_gnorm(F.col("ea")) * _gnorm(F.col("eb"))),
        6,
    )
    # Prune the member-state read to the batch's own cells (round-11,
    # guide §6 predicate pushdown): a micro-batch touches at most
    # n_clusters cells and the centroid matrix is already driver-held,
    # so collecting the batch's distinct clusters is a contract-bounded
    # driver transfer (≤ k ints); the IN filter pushes down to the
    # members parquet scan, making the per-batch state read cost
    # proportional to the touched cells instead of the whole accepted
    # corpus. Equivalence: vs_state joins on cluster, so members of
    # untouched cells can never pair with a batch row. (The vec_id
    # anti-join in _write_state deliberately stays unpruned — a
    # re-delivered id may hash to a different cell if its embedding
    # changed, and that invariant is corpus-wide.)
    batch_clusters = [r[0] for r in ranked.select("cluster").distinct().collect()]
    # vs accepted members of the same cell (self-pairs excluded: on a
    # batch replay the replayed vectors are already members)
    vs_state = (
        members.filter(F.col("cluster").isin(batch_clusters))
        .select(
            "cluster", F.col("vec_id").alias("id_a"), F.col("e").alias("ea")
        )
        .join(
            ranked.select(
                "cluster", F.col("vec_id").alias("id_b"), F.col("e").alias("eb")
            ),
            "cluster",
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_b", "id_a", pair_cos.alias("cos"))
    )
    # vs higher-priority batch-mates — upper-triangular on the batch
    # rank (kept or dropped may veto), so one batch == batch semantics
    a = ranked.select(
        "cluster", F.col("rk").alias("rk_a"), F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
    )
    b = ranked.select(
        "cluster", F.col("rk").alias("rk_b"), F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
    )
    vs_batch = (
        a.join(b, "cluster")
        .filter(F.col("rk_a") < F.col("rk_b"))
        .select("id_b", "id_a", pair_cos.alias("cos"))
    )
    matches = (
        vs_state.unionByName(vs_batch)
        .filter(F.col("cos") >= F.lit(threshold))
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(
            F.max("cos").alias("best_cos"),
            # highest-cosine neighbor, ties broken to the LOWEST id
            F.expr("max_by(id_a, struct(cos, -id_a))").alias("dup_of"),
        )
    )
    # eager pin BEFORE the write: the plan may read the decisions dir
    # (prior_ids anti-join, disk-guard mode) while the write replaces
    # partitions of that same dir — a lazy plan can list/read part
    # files mid-overwrite and die FAILED_READ_FILE (race surfaced by
    # the round-8 generative dedup_ingest family in the LSH twin of
    # this module; latent here since the round-7 prior-ids guard).
    # Batch-sized frame: one tiny extra job per micro-batch; blocks
    # released deterministically at the end of the batch.
    decisions_pin = _Pin(
        ranked.select("vec_id", "cluster")
        .join(matches, "vec_id", "left")
        .select(
            "vec_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "best_cos",
            "cluster",
        )
        .withColumn("ingest_batch", F.lit(batch_id))
    )
    pins.append(decisions_pin)
    try:
        _write_state(spark, decisions_pin, ranked, batch_id, state_dir, guard, pins)
    finally:
        for p in pins:
            p.release()


def _write_state(spark, decisions_pin, ranked, batch_id, state_dir, guard, pins):
    members = _read_or_empty(
        spark, os.path.join(state_dir, MEMBERS_SUBDIR), _MEMBERS_SCHEMA
    ).drop("ingest_batch")
    sinks.idempotent_reload(
        decisions_pin.df, os.path.join(state_dir, DECISIONS_SUBDIR), "ingest_batch"
    )

    # survivors extend the member state; a vec_id already accepted in an
    # EARLIER batch is never appended twice (left_anti), so member ids
    # stay unique even under cross-batch re-delivery. Survivor ids come
    # from the just-written decisions partition (schema'd read — an
    # empty micro-batch writes a _SUCCESS-only partition that schema
    # inference chokes on; same lesson as the LSH gate).
    survivor_ids = (
        _read_or_empty(
            spark, os.path.join(state_dir, DECISIONS_SUBDIR), _DECISIONS_SCHEMA
        )
        .filter((F.col("ingest_batch") == batch_id) & ~F.col("is_dup"))
        .select("vec_id")
    )
    # same read-under-overwrite pin as decisions: this plan reads
    # the members dir (the re-delivery anti-join) while replacing
    # partitions of the members dir
    members_pin = _Pin(
        ranked.select(
            "vec_id", "cluster", F.round(F.col("cent_cos"), 6).alias("cent_cos"),
            "e",
        )
        .join(survivor_ids, "vec_id", "left_semi")
        .join(members.select("vec_id"), "vec_id", "left_anti")
        .withColumn("ingest_batch", F.lit(batch_id))
        # cluster-ordered within each write task so parquet row-group /
        # file min-max stats stay tight and the round-11 cluster IN
        # pushdown (above) actually skips data at scale; batch-sized
        # in-partition sort, no exchange
        .sortWithinPartitions("cluster")
    )
    pins.append(members_pin)
    sinks.idempotent_reload(
        members_pin.df, os.path.join(state_dir, MEMBERS_SUBDIR), "ingest_batch"
    )
    # only after BOTH writes succeeded — a crash in between must
    # leave the increment unrecorded so the replay re-decides the
    # batch and completes the member write (crash convergence).
    # record() is a no-op on the disk path, so the call is
    # mode-agnostic.
    guard.record(spark, batch_id, decisions_pin.df.select("vec_id"))


def semantic_dedup_on_ingest(
    vec_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    centroids,
    threshold: float = 0.3,
    keep: str = "farthest",
    available_now: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Attach incremental semantic dedup to an embedding stream.

    ``centroids``: a (k, dim) matrix or a path to a persisted IVFIndex
    (the save/load manifest from round 6 — train once, save, gate
    ingest for weeks). Resolved EAGERLY here, not per batch: a torn or
    stale index must refuse at attach time, before the stream commits
    anything. Decisions land under ``state_dir``/decisions partitioned
    by micro-batch; accepted vectors under /members.
    """
    cents = _resolve_centroids(vec_stream.sparkSession, centroids)
    writer = vec_stream.writeStream.foreachBatch(
        lambda df, bid: process_batch(
            df, bid, state_dir, cents, threshold=threshold, keep=keep,
            id_col=id_col, vec_col=vec_col,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def survivors(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accepted vectors so far, in batch semantic_dedup's output shape
    (vec_id, cluster bigint, cent_cos 6dp) — what the batch-equivalence
    oracle compares."""
    return (
        _read_or_empty(
            spark, os.path.join(state_dir, MEMBERS_SUBDIR), _MEMBERS_SCHEMA
        )
        .select("vec_id", F.col("cluster").cast("bigint").alias("cluster"), "cent_cos")
    )


def run_ingest_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_semantic_dedup body: drain the embeddings
    fixture through the ingest gate in ONE availableNow batch (fresh
    state per call), centroids trained exactly as dedup_semantic trains
    them (same fn, same k/n_iter — deterministic). Over empty state a
    single batch reduces to the batch upper-triangular rule, so the
    survivors equal semantic_dedup's output row-for-row and the
    operator inherits its full DuckDB value oracle — the same
    batch-equivalence trick as streaming_incremental_dedup."""
    import shutil
    import tempfile
    import uuid

    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops.similarity import kmeans_centroids_embeddings
    from lime_etl_spark.ops.util import cleanup_dir_at_exit

    emb = read_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids_embeddings(emb, dim=64, k=16, n_iter=5)
    if getattr(cents, "shape", (0,))[0] == 0:
        # an EMPTY corpus has no clustering to gate against — the
        # attach-time refusal is right for a real stream (a gate that
        # accepts everything under cluster -1 would be silent data
        # corruption), but the batchlike wrapper's contract is "gate
        # this corpus", and gating nothing is legitimately zero rows
        # (matches the batch oracle's empty-input form)
        return spark.createDataFrame(
            [], "vec_id bigint, cluster bigint, cent_cos double"
        )

    src = os.path.join(sf_dir, "embeddings.parquet")
    work = tempfile.mkdtemp(prefix=f"lime_semingest_{uuid.uuid4().hex[:8]}_")
    cleanup_dir_at_exit(work)
    if os.path.isdir(src):
        src_dir = src
    else:
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        shutil.copyfile(src, os.path.join(src_dir, "embeddings.parquet"))
    state = os.path.join(work, "state")
    ck = os.path.join(work, "ck")
    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<float>, label int"
    ).parquet(src_dir)
    q = semantic_dedup_on_ingest(stream, state, ck, cents, threshold=0.3)
    q.awaitTermination()
    return survivors(spark, state)
