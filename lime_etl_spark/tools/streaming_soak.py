"""Continuous-trigger streaming soak: watermark-bounded state, observed.

Every streaming gate in the registry drains its input with
``availableNow`` (batch-like, one or few micro-batches) — correct for
the oracle harness, but it never demonstrates the property the 100 TB
deployment actually depends on: under a CONTINUOUS trigger with
endless late-ish data, state-store rows/bytes must plateau at the
watermark horizon instead of growing with the stream, and a
foreachBatch maintainer's per-batch cost must stay flat as its
accumulated corpus grows.

Two soaks (both on the ``rate`` source — deterministic synthetic data,
no files to stage):

1. ``session_windows`` (real state-store op): events with event-time
   lateness jitter up to 2x the watermark, so sessions merge, close,
   and evict continuously; we poll ``StreamingQuery.lastProgress`` and
   record per-batch state rows/bytes + the watermark's advance. Pass =
   state rows in the final quarter grow <10% of the first quarter's
   growth (plateau), with late rows actually dropped (the op's
   numRowsDroppedByWatermark counter).

2. ``dedup_on_ingest`` (foreachBatch incremental LSH dedup): a vocab
   of N base documents repeats forever, so after N survivors the state
   corpus plateaus and every later batch is ~all duplicates. Pass =
   mean trigger duration in the final third within 2x of the first
   third (per-batch cost bounded by batch size, not corpus size).

CLI::

    python -m lime_etl_spark.tools.streaming_soak --duration 180 \
        --out /tmp/soak.json
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_events(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    """Synthetic event stream with UNBOUNDED key cardinality: the user
    population rotates every ~7500 rows (a "generation" of 500 users
    goes active, then permanently quiet), so total distinct users grows
    without bound while watermark eviction keeps live state bounded —
    a constant-population stream would plateau trivially with sessions
    that never close. Event time is jittered 0-90 s behind arrival
    (deterministic in ``value``) so a 45 s watermark sees both
    in-order and too-late data."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("timestamp") - (F.col("value") % 90).cast("int") * F.expr("INTERVAL 1 SECOND")).alias("ts"),
            (F.floor(F.col("value") / 7500) * 500 + F.col("value") % 500).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]),
                (F.col("value") % 5 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("value") % 100) / 10.0).alias("value"),
        )
    )


def rate_documents(spark: SparkSession, rows_per_sec: int, vocab_docs: int = 400) -> DataFrame:
    """Synthetic document stream: ``vocab_docs`` base documents of 12
    pseudo-words repeat forever — every occurrence after the first is
    an exact duplicate, so the survivor corpus plateaus (at most
    ``vocab_docs`` exact-distinct texts; near-dup merging under the
    gate's threshold shrinks it further) while input keeps flowing.

    The word hash runs mod 9973 (prime, > any sane vocab_docs × step):
    31 is invertible mod 9973, so two bases collide on ALL 12 words
    only if equal — an earlier %97 version silently capped distinct
    documents at 97 regardless of vocab_docs (review finding)."""
    base = F.col("value") % vocab_docs
    words = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.concat(F.lit("w"), ((base * 31 + i * 13) % 9973).cast("string")),
    )
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
    )


def _poll(q, deadline: float, poll_s: float = 2.0) -> list[dict]:
    """Collect distinct lastProgress snapshots until the deadline.

    A query that DIES mid-soak must fail the soak, not produce a
    truncated 'pass' (review finding): lastProgress keeps returning
    the final pre-crash snapshot, so without the isActive check a
    crashed 30-second run would be scored as a quiet 3-minute one.
    """
    seen: dict[int, dict] = {}
    while time.time() < deadline:
        if not q.isActive:
            ex = q.exception()
            if ex is not None:
                raise RuntimeError(f"soak query died mid-run: {ex}")
            break  # finished cleanly (bounded source)
        p = q.lastProgress
        if p:
            seen[p["batchId"]] = p
        time.sleep(poll_s)
    return [seen[b] for b in sorted(seen)]


def soak_session_windows(
    spark: SparkSession, duration_s: int, rocksdb: bool = False
) -> dict:
    from lime_etl_spark.streaming.events import (
        session_windows,
        use_rocksdb_state_store,
    )

    if rocksdb:
        # the production state backend for large keyspaces (off-heap +
        # incremental checkpointing); conf applies to queries started
        # after this call
        use_rocksdb_state_store(spark, True)
    try:
        ev = rate_events(spark, rows_per_sec=2000)
        sess = session_windows(ev, gap="30 seconds", watermark="45 seconds")
        work = tempfile.mkdtemp(prefix=f"lime_soak_{uuid.uuid4().hex[:8]}_")
        q = (
            sess.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", os.path.join(work, "ck"))
            .trigger(processingTime="2 seconds")
            .start()
        )
        try:
            progresses = _poll(q, time.time() + duration_s)
        finally:
            q.stop()
    finally:
        if rocksdb:
            # session-wide conf — a later stateful soak in the same
            # main() would silently inherit RocksDB (r4 ADVICE)
            use_rocksdb_state_store(spark, False)
    batches = []
    for p in progresses:
        ops = p.get("stateOperators") or []
        batches.append(
            {
                "batchId": p["batchId"],
                "numInputRows": p.get("numInputRows"),
                "stateRows": sum(o.get("numRowsTotal", 0) for o in ops),
                "stateBytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
                "droppedByWatermark": sum(
                    o.get("numRowsDroppedByWatermark", 0) for o in ops
                ),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
    rows = [b["stateRows"] for b in batches]
    n = len(rows)
    verdict: dict = {"batches": batches}
    if n >= 8:
        q1_growth = rows[n // 4] - rows[0]
        q4_growth = rows[-1] - rows[3 * n // 4]
        verdict["first_quarter_state_growth"] = q1_growth
        verdict["final_quarter_state_growth"] = q4_growth
        verdict["state_plateaued"] = q4_growth <= max(0.1 * max(q1_growth, 1), 0)
        verdict["late_rows_dropped"] = sum(b["droppedByWatermark"] for b in batches) > 0
    return verdict


def soak_incremental_dedup(spark: SparkSession, duration_s: int) -> dict:
    from lime_etl_spark.streaming.dedup import DOCS_SUBDIR, dedup_on_ingest

    docs = rate_documents(spark, rows_per_sec=150)
    work = tempfile.mkdtemp(prefix=f"lime_soak_{uuid.uuid4().hex[:8]}_")
    state = os.path.join(work, "state")
    q = dedup_on_ingest(
        docs,
        state,
        os.path.join(work, "ck"),
        threshold=0.5,
        available_now=False,
    )
    # dedup_on_ingest's writer has no trigger set in continuous mode —
    # micro-batches fire back-to-back, which IS the soak condition
    try:
        progresses = _poll(q, time.time() + duration_s)
    finally:
        q.stop()
    batches = [
        {
            "batchId": p["batchId"],
            "numInputRows": p.get("numInputRows"),
            "triggerMs": (p.get("durationMs") or {}).get("triggerExecution"),
        }
        for p in progresses
    ]
    out: dict = {"batches": batches}
    timed = [b for b in batches if b["triggerMs"] and b["numInputRows"]]
    n = len(timed)
    if n >= 6:
        first = [b["triggerMs"] for b in timed[: n // 3]]
        last = [b["triggerMs"] for b in timed[-(n // 3):]]
        out["mean_trigger_ms_first_third"] = sum(first) / len(first)
        out["mean_trigger_ms_final_third"] = sum(last) / len(last)
        out["per_batch_cost_flat"] = (
            out["mean_trigger_ms_final_third"]
            <= 2.0 * out["mean_trigger_ms_first_third"]
        )
    try:
        out["survivor_corpus_rows"] = (
            spark.read.parquet(os.path.join(state, DOCS_SUBDIR)).count()
        )
    except Exception:
        out["survivor_corpus_rows"] = None
    return out


def rate_embeddings(
    spark: SparkSession, rows_per_sec: int, vocab_vecs: int = 400, dim: int = 16
) -> DataFrame:
    """Synthetic embedding stream: ``vocab_vecs`` base vectors repeat
    forever (every later occurrence is an exact duplicate → cosine 1.0
    to its first arrival), so the member state plateaus while input
    keeps flowing — the semantic mirror of rate_documents. Components
    are sin() of a per-(base, dim) lattice: deterministic JVM
    expressions, distinct bases nowhere near collinear."""
    base = F.col("value") % vocab_vecs
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.sin((base * 31 + i * 13).cast("double")),
    )
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(F.col("value").alias("vec_id"), vec.alias("embedding"))
    )


def _soak_centroids(dim: int = 16, k: int = 64):
    """Deterministic (k, dim) centroid lattice for the soak — the
    production path trains once and persists; the soak needs only A
    fixed clustering so per-batch work is cell-bounded. k=64 mirrors
    the operator's own contract (cells sized so in-cell pair work is
    ~n*budget): at k=8 a backlogged batch went quadratic in-cell and
    each slow batch grew the next one's backlog — runaway, 2 batches
    in 180 s."""
    import numpy as np

    i = np.arange(k)[:, None]
    j = np.arange(dim)[None, :]
    return np.cos(i * 7 + j * 3).astype(np.float64)


def soak_semantic_dedup(spark: SparkSession, duration_s: int) -> dict:
    """Continuous-trigger soak for the incremental semantic stage
    (r7 verdict next-round #5): per-batch cost must stay flat as the
    member state grows, because each batch's candidate joins are
    keyed on cluster and bounded by batch × cell membership — at a
    plateaued member corpus that bound is a constant. Pass criterion
    matches soak_incremental_dedup: mean trigger duration in the
    final third within 2x of the first third."""
    from lime_etl_spark.streaming.semantic import MEMBERS_SUBDIR, semantic_dedup_on_ingest

    vecs = rate_embeddings(spark, rows_per_sec=100)
    work = tempfile.mkdtemp(prefix=f"lime_soak_{uuid.uuid4().hex[:8]}_")
    state = os.path.join(work, "state")
    q = semantic_dedup_on_ingest(
        vecs,
        state,
        os.path.join(work, "ck"),
        _soak_centroids(),
        threshold=0.99,
        available_now=False,
    )
    try:
        progresses = _poll(q, time.time() + duration_s)
    finally:
        q.stop()
    batches = [
        {
            "batchId": p["batchId"],
            "numInputRows": p.get("numInputRows"),
            "triggerMs": (p.get("durationMs") or {}).get("triggerExecution"),
        }
        for p in progresses
    ]
    out: dict = {"batches": batches}
    timed = [b for b in batches if b["triggerMs"] and b["numInputRows"]]
    n = len(timed)
    if n >= 6:
        first = [b["triggerMs"] for b in timed[: n // 3]]
        last = [b["triggerMs"] for b in timed[-(n // 3):]]
        out["mean_trigger_ms_first_third"] = sum(first) / len(first)
        out["mean_trigger_ms_final_third"] = sum(last) / len(last)
        out["per_batch_cost_flat"] = (
            out["mean_trigger_ms_final_third"]
            <= 2.0 * out["mean_trigger_ms_first_third"]
        )
    try:
        out["member_state_rows"] = (
            spark.read.parquet(os.path.join(state, MEMBERS_SUBDIR)).count()
        )
        # exact-duplicate vocab: members must plateau at <= vocab_vecs
        out["member_state_plateaued"] = out["member_state_rows"] <= 400
    except Exception:
        out["member_state_rows"] = None
    return out


def semantic_ingest_scale(
    spark: SparkSession,
    small_dir: str,
    big_dir: str,
    dim: int = 64,
    files_per_trigger: int = 4,
) -> dict:
    """Bounded-ingest scale ratio for the semantic stage: drain a
    small and a 10x embedding corpus through semantic_dedup_on_ingest
    (availableNow, same trigger bound → same batch COUNT, 10x batch
    sizes) and report the wall ratio. Sublinear (< 10x at 10x data)
    means per-batch fixed overhead amortizes and the cell-keyed
    candidate work is not super-linear in corpus — the semantic
    mirror of streaming LSH dedup's SOAK scale line (4.8x @ 100x)."""
    import numpy as np

    from lime_etl_spark.ops.similarity import (
        kmeans_centroids_embeddings,
        recommended_n_clusters,
    )
    from lime_etl_spark.streaming.semantic import semantic_dedup_on_ingest, survivors

    out: dict = {"small_dir": small_dir, "big_dir": big_dir}
    walls = {}
    for label, src in (("small", small_dir), ("big", big_dir)):
        corpus = spark.read.parquet(src)
        n = corpus.count()
        # train once per corpus (the production amortized step; timed
        # separately so the reported ratio is the INGEST path)
        k = recommended_n_clusters(n)
        t0 = time.time()
        cents = kmeans_centroids_embeddings(corpus, dim, k=k, n_iter=3)
        train_s = time.time() - t0
        work = tempfile.mkdtemp(prefix=f"lime_semscale_{uuid.uuid4().hex[:8]}_")
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(src)
        )
        t0 = time.time()
        q = semantic_dedup_on_ingest(
            stream, os.path.join(work, "state"), os.path.join(work, "ck"),
            cents, threshold=0.95,
        )
        q.awaitTermination()
        wall = time.time() - t0
        walls[label] = wall
        out[label] = {
            "rows": n,
            "n_clusters": k,
            "train_sec": round(train_s, 2),
            "ingest_wall_sec": round(wall, 2),
            "survivor_rows": survivors(
                spark, os.path.join(work, "state")
            ).count(),
        }
    out["data_ratio"] = round(out["big"]["rows"] / out["small"]["rows"], 1)
    out["ingest_wall_ratio"] = round(walls["big"] / walls["small"], 2)
    out["sublinear"] = out["ingest_wall_ratio"] < out["data_ratio"]
    return out


def soak_quality_monitor(spark: SparkSession, duration_s: int) -> dict:
    """Continuous quality-at-ingest: rate events with a deterministic
    2% NULL-user_id floor plus periodic 30% bursts (every 5th
    25k-value block), monitored by streaming/quality.monitor_quality.
    Pass = the per-batch timeline actually RESOLVES the bursts: max
    per-batch violation rate >= 3x the median rate, and the state
    stays tiny (a few report rows per batch)."""
    from lime_etl_spark.ops import quality as Q
    from lime_etl_spark.streaming.quality import monitor_quality, timeline

    ev = rate_events(spark, rows_per_sec=2000)
    burst = (F.floor(F.col("event_id") / 25000) % 5) == 4
    dirty = ev.withColumn(
        "user_id",
        F.when(
            (F.col("event_id") % 1000)
            < F.when(burst, F.lit(300)).otherwise(F.lit(20)),
            F.lit(None).cast("bigint"),
        ).otherwise(F.col("user_id")),
    )
    work = tempfile.mkdtemp(prefix=f"lime_soak_{uuid.uuid4().hex[:8]}_")
    state = os.path.join(work, "state")
    q = monitor_quality(
        dirty,
        state,
        os.path.join(work, "ck"),
        rules=[Q.not_null("user_id")],
        available_now=False,
    )
    try:
        progresses = _poll(q, time.time() + duration_s)
    finally:
        q.stop()
    rows = {
        (r["ingest_batch"], r["rule"]): r["n_violations"]
        for r in timeline(spark, state).collect()
    }
    counts = {
        b: n for (b, rule), n in rows.items() if rule == "row_count"
    }
    nulls = {b: n for (b, rule), n in rows.items() if rule == "not_null"}
    batches = [
        {
            "batchId": b,
            "rows": counts[b],
            "null_user_violations": nulls.get(b, 0),
            "rate": round(nulls.get(b, 0) / counts[b], 4) if counts[b] else None,
        }
        for b in sorted(counts)
        if counts[b]
    ]
    rates = sorted(b["rate"] for b in batches if b["rate"] is not None)
    out: dict = {"batches": batches, "n_batches": len(batches)}
    if len(rates) >= 8:
        med = rates[len(rates) // 2]
        out["median_rate"] = med
        out["max_rate"] = rates[-1]
        out["burst_resolved"] = med > 0 and rates[-1] >= 3 * med
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--duration", type=int, default=180, help="seconds per soak")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--which", nargs="*", default=["session_windows", "incremental_dedup"]
    )
    ap.add_argument(
        "--rocksdb", action="store_true",
        help="run the state-store soak on the RocksDB provider (production backend)",
    )
    args = ap.parse_args()

    from lime_etl_spark.session import get_spark

    spark = get_spark("streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"duration_s": args.duration, "rocksdb": args.rocksdb}
    if "session_windows" in args.which:
        result["session_windows"] = soak_session_windows(
            spark, args.duration, rocksdb=args.rocksdb
        )
    if "incremental_dedup" in args.which:
        result["incremental_dedup"] = soak_incremental_dedup(spark, args.duration)
    if "quality_monitor" in args.which:
        result["quality_monitor"] = soak_quality_monitor(spark, args.duration)
    if "semantic_dedup" in args.which:
        result["semantic_dedup"] = soak_semantic_dedup(spark, args.duration)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
