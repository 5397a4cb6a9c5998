"""Semantic tests for ops/graph.pagerank — the oracle differential in
test_oracle.py pins cross-engine values; these pin the algorithm."""

from __future__ import annotations

from lime_etl_spark.ops import graph

SCALE = graph.SCALE


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_star_center_dominates(spark):
    # 1..4 all point at 5; 5 points back at 1 (so nothing dangles)
    pr = {
        r["node"]: r["pr_scaled"]
        for r in graph.pagerank(
            _edges(spark, [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1)])
        ).collect()
    }
    assert pr[5] > pr[1] > pr[2] == pr[3] == pr[4]
    # mass is conserved up to integer-division truncation
    assert sum(pr.values()) <= SCALE
    assert sum(pr.values()) > SCALE * 0.95


def test_pagerank_no_inlinks_settles_at_base(spark):
    # 1 -> 2: node 1 has no in-links, so after the first iteration it
    # holds exactly the teleport base term
    pr = {
        r["node"]: r["pr_scaled"]
        for r in graph.pagerank(_edges(spark, [(1, 2)]), n_iter=3).collect()
    }
    assert pr[1] == (15 * SCALE) // (100 * 2)


def test_pagerank_checkpoint_path_matches(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    plain = sorted(
        (r["node"], r["pr_scaled"])
        for r in graph.pagerank(edges, n_iter=4).collect()
    )
    chk = sorted(
        (r["node"], r["pr_scaled"])
        for r in graph.pagerank(edges, n_iter=4, checkpoint_every=2).collect()
    )
    assert plain == chk


def test_pagerank_materialized_inputs_cut_source_lineage(spark):
    """materialize_inputs must sever EVERY per-iteration input from the
    source lineage — n_nodes and the initial ranks used to be built
    from the pre-checkpoint node set, so the broadcast crossJoined into
    each iteration re-scanned the edge input per round, defeating the
    knob. With the knob on, the final plan contains no scan of the
    original (LocalTableScan) edges; values equal the lazy path."""
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    lazy = {
        r["node"]: r["pr_scaled"]
        for r in graph.pagerank(_edges(spark, pairs), n_iter=3).collect()
    }
    mat_df = graph.pagerank(
        _edges(spark, pairs), n_iter=3, materialize_inputs=True
    )
    plan = mat_df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalTableScan" not in plan and "LocalRelation" not in plan
    mat = {r["node"]: r["pr_scaled"] for r in mat_df.collect()}
    assert mat == lazy


def test_copurchase_edges_symmetric_distinct(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20), (2, 10), (2, 30)],
        "l_orderkey long, l_partkey long",
    )
    got = sorted(tuple(r) for r in graph.copurchase_edges(li).collect())
    assert got == [(10, 20), (10, 30), (20, 10), (30, 10)]
