"""Graph operators: fixed-iteration PageRank in portable scaled-integer
arithmetic.

Training-data pipelines use link-graph centrality as a quality prior
(e.g. page importance over a web-crawl link graph when weighting crawl
documents). The fixture has no link table, so the registry demonstrates
the operator on the co-purchase graph (parts sharing an order), but the
operator itself is graph-agnostic: any (src, dst) edge DataFrame works.

Design for scale:
- one iteration = one equi-join of the edge table with the current rank
  vector (shuffle on src) + one groupBy(dst) partial/final sum — both
  linear in |E|; no driver-side state, no collect;
- the rank vector stays partitioned on the node key across iterations
  (same join key ⇒ exchange reuse);
- a FIXED iteration count builds a linear plan; for many iterations use
  ``checkpoint_every`` (localCheckpoint, same lineage-truncation
  pattern as ops/dedup.connected_components);
- ALL arithmetic is integer: ranks live in 1e12-scaled BIGINT,
  per-edge contribution is ``rank DIV outdeg`` (truncating division),
  damping applies as ``(pct * x) DIV 100``. Every operation is exact
  and identical across engines — the DuckDB oracle unrolls the same
  iterations with `//`, so PageRank value-checks bit-for-bit, with no
  float accumulation-order caveats. Headroom: damping multiplies by
  ≤100 before dividing, so values stay < 1e15 ≪ int64 max.

Semantics notes (standard simplifications, both sides identical):
- dangling nodes (no out-edges) leak their mass — ranks sum to < 1;
- nodes with no in-edges settle at the teleport base term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lime_etl_spark.plans import auto_broadcast

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int | None = None,
    materialize_inputs: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list.

    Returns (node, pr_scaled BIGINT, pr DOUBLE) where ``pr_scaled`` is
    the exact 1e12-scaled integer rank and ``pr`` its float view
    (single cast+divide — deterministic IEEE, safe to hash-compare).

    ``materialize_inputs`` (default OFF) localCheckpoints the prepared
    per-iteration inputs — (edge ⋈ outdeg) and the node set — before
    iterating. Measured at sf0.1/sf1 (BENCH_new_ops note in SCALE.md):
    the plain lazy plan is ~3× FASTER, because AQE's final plan reuses
    the edge-build exchanges across all iterations (14 ReusedExchange
    nodes at n_iter=3 — the fact table is scanned and shuffled once,
    then every iteration re-reads those shuffle files), while explicit
    materialization pays block-manager writes AND severs codegen
    fusion. The knob stays for executor-memory-pressure regimes where
    evicted shuffle data would force fact-table rescans; for DEEP
    iteration counts use ``checkpoint_every`` (lineage truncation, same
    pattern as ops/dedup.connected_components).
    """
    if not 0 < damping_pct <= 100:
        raise ValueError("damping_pct in (0, 100]")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    contrib_src = e.join(outdeg, "src")
    if materialize_inputs:
        contrib_src = contrib_src.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    # scalar graph size + initial ranks derive from the (possibly
    # checkpointed) node set — they used to be built from the
    # pre-checkpoint lineage, so the n_nodes broadcast crossJoined into
    # EVERY iteration re-scanned the edge input per round, defeating
    # the knob's whole purpose (memory-pressure regimes where evicted
    # shuffle data forces fact-table rescans)
    # single-row broadcast (shape-asserted pattern, see io/sinks.py
    # zorder stats)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    pr = (
        nodes.crossJoin(auto_broadcast(n_nodes, bounded=True))  # 1-row count
        .select("node", F.expr(f"CAST({SCALE} AS BIGINT) DIV n_nodes").alias("pr"))
    )
    for i in range(n_iter):
        contribs = (
            contrib_src.join(pr.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(auto_broadcast(n_nodes, bounded=True))  # 1-row count
            .select(
                "node",
                (
                    F.expr(
                        f"CAST(({100 - damping_pct} * {SCALE}) AS BIGINT)"
                        " DIV (100 * n_nodes)"
                    )
                    + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
                ).cast("bigint").alias("pr"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    return pr.select(
        "node",
        F.col("pr").alias("pr_scaled"),
        (F.col("pr") / F.lit(float(SCALE))).alias("pr"),
    )


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edge list: two parts are linked when they
    appear in the same order (both directions emitted). The self-join
    fans out quadratically in lines-PER-ORDER — bounded at 7 in
    TPC-H-shaped data and small in real baskets — while staying linear
    in orders; DISTINCT collapses repeat co-purchases."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
