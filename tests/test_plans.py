"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §4).

These tests pin the *plan shape*, not results: filters reach the parquet
scan, column pruning holds, small dims broadcast, global top-n avoids a
full sort, and codegen covers the hot path. A regression here is a
scale bug even when results stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.ops import analytics
from lime_etl_spark.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_predicates_pushed_to_scan(spark, sf_dir):
    df = REGISTRY["q6_revenue_forecast"].spark_fn(spark, sf_dir)
    plan = _formatted(df)
    assert "PushedFilters:" in plan
    # the shipdate range + discount + quantity predicates all push down
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_column_pruning(spark, sf_dir):
    df = REGISTRY["q6_revenue_forecast"].spark_fn(spark, sf_dir)
    plan = _formatted(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    # only the 4 referenced columns are read, not all 11
    assert "l_extendedprice" in read_schema and "l_discount" in read_schema
    for unused in ("l_returnflag", "l_partkey", "l_comment", "l_tax"):
        assert unused not in read_schema


def test_q5_broadcasts_small_dims(spark, sf_dir):
    df = REGISTRY["q5_region_revenue"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # region+nation+supplier must never shuffle the fact side
    assert plan.count("BroadcastHashJoin") >= 3


def test_topn_uses_take_ordered(spark, sf_dir):
    part = read_table(spark, sf_dir, "part")
    df = analytics.sort_topn(
        part.select("p_partkey", "p_retailprice"),
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        10,
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].spark_fn(spark, sf_dir)
    # AQE reveals the final plan only after execution; codegen membership
    # appears as the *(n) stage markers in the plan string. Also pin the
    # partial-before-exchange aggregation (map-side combine).
    df.collect()
    plan = _plan(df)
    assert "*(" in plan
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange hashpartitioning") or (
        "partial_sum" in plan.split("Exchange hashpartitioning")[1]
    )


def test_dedup_latest_single_shuffle(spark, sf_dir):
    df = REGISTRY["dedup_latest_event_per_user"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    # one hash exchange for the window; no global sort (Sort appears
    # only inside the partitioned window, which is fine), no extra joins
    assert plan.count("Exchange hashpartitioning") == 1


def test_semi_anti_join_types(spark, sf_dir):
    semi = REGISTRY["join_semi_urgent_customers"].spark_fn(spark, sf_dir)
    anti = REGISTRY["join_anti_customers_without_orders"].spark_fn(spark, sf_dir)
    assert "LeftSemi" in _plan(semi)
    assert "LeftAnti" in _plan(anti)


def test_no_cartesian_in_registry_except_ann(spark, sf_dir):
    # brute-force ANN and the exact cosine all-pairs twin are the
    # intentional cross-join-shaped ops (broadcast side bounded; LSH /
    # bucketed forms are the scale path and ARE audited); everything
    # else must be join-keyed. streaming_* entries run their stream and
    # return the materialized memory-sink table, so they pass through
    # this audit trivially (plan = local scan) — their actual dataflow
    # is audited pre-start by
    # test_no_cartesian_in_streaming_transformations below.
    # zorder_key_* broadcast-join a ONE-ROW min/max aggregate back over
    # the data (the scalar-subquery plan shape) — a BNLJ whose build
    # side is a single row, not a data-sized cartesian; assert that
    # narrowness instead of exempting the names blindly.
    for name, q in REGISTRY.items():
        if name.startswith("ann_") or name == "dedup_embedding_cosine":
            continue
        plan = _plan(q.spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        if name.startswith("zorder_key_"):
            assert plan.count("BroadcastNestedLoopJoin") <= 1, name
            # keys=[] = a GLOBAL aggregate feeds the broadcast: one row
            assert "keys=[]" in plan, name
            continue
        # one-row scalar broadcasts (global aggregate, keys=[]):
        # pagerank broadcasts n_nodes into the init vector + each of the
        # 3 unrolled iterations; collocations broadcasts the corpus
        # token total once
        ONE_ROW_BNLJ = {
            "graph_pagerank_copurchase": 4,
            "text_collocations": 1,
            # drift: the ref stats row broadcasts into each side's
            # binning — exactly two one-row keys=[] broadcasts since
            # the round-10 window rewrite (the old tot/totals/final
            # agg+crossJoin pyramid repeated the binned subtrees to 8
            # BNLJ nodes and relied on AQE stage reuse to dedup them
            # at runtime; the window form is single-reference by
            # structure)
            "quality_drift_price": 2,
        }
        if name in ONE_ROW_BNLJ:
            assert plan.count("BroadcastNestedLoopJoin") <= ONE_ROW_BNLJ[name], name
            assert "keys=[]" in plan, name
            continue
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_no_cartesian_in_streaming_transformations(spark, sf_dir):
    """The registry's streaming entries execute the stream (memory-sink
    table — no lazy plan), so the cartesian audit above can't see them.
    Audit the streaming transformations directly: before .start() the
    streaming DataFrame is lazy and its analyzed plan is inspectable."""
    from lime_etl_spark.streaming import events as sevents

    stream = sevents.read_events_stream(spark, sevents.stage_events_dir(sf_dir))
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    for df in (
        sevents.tumbling_counts(stream),
        sevents.sliding_counts(stream),
        sevents.session_windows(stream),
        sevents.dedup_within_watermark(stream),
        sevents.click_purchase_interval_join(clicks, purchases),
    ):
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "Join Cross" not in plan
        assert "CartesianProduct" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """Two window passes + the per-session aggregate all share ONE hash
    exchange on user_id: HashPartitioning(user_id) satisfies the
    (user_id, session_id) clustering requirement, so Catalyst plans no
    second shuffle. A regression here doubles the shuffle volume of
    every sessionization at scale."""
    df = REGISTRY["events_sessionized"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 1


def test_running_window_single_exchange(spark, sf_dir):
    df = REGISTRY["window_running_spend"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 1


def test_minhash_single_wide_exchange(spark, sf_dir):
    """Signature aggregation: one hash exchange (group by doc id) after
    the round-robin spread; the 16 min() aggregates ride one shuffle."""
    df = REGISTRY["dedup_minhash_signatures"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 1


def test_merged_window_queries_single_exchange(spark, sf_dir):
    """Each merged window-family query must keep ONE hash exchange on
    its partition key — the whole point of merging functions over a
    shared window spec. window_customer_spend additionally pins 2
    Window operators (rows vs range frames need different sort keys);
    window_event_features pins 1 (lag/avg/first/last share partition,
    order, and differ only in frame -> Catalyst collapses them)."""
    spend = _plan(REGISTRY["window_customer_spend"].spark_fn(spark, sf_dir))
    assert spend.count("Exchange hashpartitioning") == 1
    assert spend.count("Window") == 2
    feats = _plan(REGISTRY["window_event_features"].spark_fn(spark, sf_dir))
    assert feats.count("Exchange hashpartitioning") == 1
    assert feats.count("Window") == 1
    ranks = _plan(REGISTRY["window_rank_percentiles"].spark_fn(spark, sf_dir))
    assert ranks.count("Exchange hashpartitioning") == 1
    assert ranks.count("Window") == 1


def test_merged_semi_anti_has_both_join_types(spark, sf_dir):
    plan = _plan(REGISTRY["join_semi_anti_customers"].spark_fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q2_q9_broadcast_dims_and_partial_agg(spark, sf_dir):
    q2 = _plan(REGISTRY["q2_min_cost_supplier"].spark_fn(spark, sf_dir))
    # supplier/nation/region/part broadcast; the min-cost groupBy
    # partial-aggregates map-side before its wide exchange
    assert q2.count("BroadcastHashJoin") >= 4
    assert "partial_min" in q2
    q9 = _plan(REGISTRY["q9_profit_by_nation_year"].spark_fn(spark, sf_dir))
    assert q9.count("BroadcastHashJoin") >= 3
    assert "partial_sum" in q9


def test_ngram_single_explode_and_cap_rides_selfjoin_exchange(spark, sf_dir):
    """Two properties of the ngram plan (assert on the FINAL adaptive
    plan — only materialized after execution):

    1. The capped inverted index (window count over sh) feeds both
       self-join sides through ONE shuffle write — AQE exchange reuse,
       so the doc-frequency cap adds no shuffle volume.
    2. The final plan carries exactly ONE exploded-index subtree.
       Before round 4 the per-doc size aggregates re-ran the whole
       tokenize+explode+window pipeline (AQE demonstrably did NOT
       reuse that subtree across the groupBy(id) boundary — two full
       Generate+Window stages dominated executor time, 16.9s → 11.2s
       after the fix at sf0.1).
    3. Round 10: sizes ride THROUGH the explode as a payload column
       and come back out of the pair groupBy as min(n_shingles), so
       the two post-join size lookups are gone — the whole query is
       exactly ONE join (the index self-join). Any second join means
       the size attachment regressed to separate plan subtrees."""
    df = REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") >= 1, final.count("ReusedExchange")
    assert final.count("Generate explode") == 1, final.count("Generate explode")
    n_joins = sum(
        final.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert n_joins == 1, final


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Packing = one hash exchange on pack_bucket (the per-bucket
    cumsum window); the bin arithmetic is projection on top. A second
    exchange would mean the bin id computation re-shuffled."""
    from lime_etl_spark.ops.sampling import pack_sequences
    from lime_etl_spark.ops.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    plan = _plan(pack_sequences(docs, budget=512, n_buckets=8))
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_no_global_sort(spark, sf_dir):
    """Per-doc top-k must rank inside doc partitions (window
    row_number), never globally sort the scored (doc, term) table."""
    from lime_etl_spark.ops.text import tfidf_top_terms

    docs = read_table(spark, sf_dir, "documents")
    plan = _plan(tfidf_top_terms(docs, k=3))
    assert "Exchange rangepartitioning" not in plan


def test_tfidf_single_tokenize_pass(spark, sf_dir):
    """doc_freq derives FROM the tf aggregate (one row per (doc,term)
    → count per term == docs containing the term), so the corpus is
    tokenized exactly once: the two references to tf's groupBy are
    byte-identical subtrees whose exchange AQE reuses at runtime (the
    old separate explode(array_distinct) leg was a second, never
    reusable Generate). Asserted on the EXECUTED final plan — the
    initial plan legitimately shows both references; only AQE's stage
    cache collapses them."""
    from lime_etl_spark.ops.text import tfidf_top_terms

    docs = read_table(spark, sf_dir, "documents")
    df = tfidf_top_terms(docs, k=3, n_docs=1)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert final.count("Generate") == 1
    assert final.count("ReusedExchange") == 1


def test_simhash_near_pairs_single_signature_pass(spark, sf_dir):
    """The band self-join's two signature subtrees are canonically
    equal, so AQE stage reuse must execute the tokenize→hash→SimHash
    pipeline exactly ONCE (one scan + a ReusedExchange in the executed
    plan). This is the property that made the bucket-local rewrite a
    measured pessimization (see simhash_near_pairs docstring) — if
    this assert ever breaks (an alias change defeating
    canonicalization), the corpus is being fingerprinted twice and the
    self-join shape needs re-evaluation."""
    from lime_etl_spark.ops.dedup import simhash_near_pairs

    docs = read_table(spark, sf_dir, "documents")
    df = simhash_near_pairs(docs)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    assert final.count("Scan parquet") == 1
    assert final.count("ReusedExchange") >= 1


def test_span_dedup_two_linear_exchanges(spark, sf_dir):
    """Corpus span dedup = exactly two hash shuffles: the global
    first-occurrence window on the span key, then the per-doc
    reassembly groupBy. Anything more means the rebuild re-shuffled."""
    df = REGISTRY["text_span_dedup"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 2


def test_filter_decisions_single_exchange(spark, sf_dir):
    """The composite keep/drop verdict must stay one shuffle (the
    fingerprint window); stats, score, langid, and the rule cascade
    are all narrow projections riding it."""
    df = REGISTRY["corpus_filter_decisions"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 1


def test_pack_materialize_two_exchanges(spark, sf_dir):
    """Packing assignment (bucket window) + bin reassembly (groupBy
    pack_bin) = two hash exchanges total; the materialization must not
    re-shuffle beyond its own bin key."""
    df = REGISTRY["pack_materialized_docs"].spark_fn(spark, sf_dir)
    assert _plan(df).count("Exchange hashpartitioning") == 2


def test_union_output_partitioning_unsound(spark, sf_dir):
    """Spark 4.1.2 regression pin (found by the generative sweep, seed
    1869): with spark.sql.unionOutputPartitioning=true (the upstream
    DEFAULT), UnionExec advertises its children's hash partitioning and
    a downstream aggregate/set-op skips its exchange — but equal keys
    live in different LEG partitions, so byte-identical group keys
    split into separate hash groups: 12 groups for 5 distinct strings,
    exceptAll ignoring its subtrahend (620 vs 498), intersectAll
    returning 0 for 122 true matches. The session factory pins the conf
    false; this test asserts both the fix and (while the upstream
    default stays broken) the unsoundness itself, so a Spark upgrade
    that repairs the optimization surfaces here as a pleasant surprise
    rather than silent behavior drift."""
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sources import read_table

    assert spark.conf.get("spark.sql.unionOutputPartitioning") == "false"
    ev = read_table(spark, sf_dir, "events")
    w = (
        "last_value(props) OVER (PARTITION BY event_type ORDER BY event_id "
        "ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )

    def sides():
        D = ev.withColumn("d1", F.expr(w)).withColumn(
            "d2", F.expr("substr(props, 1, 2)")
        )
        u = (
            D.filter("(event_type <= 'error') AND (user_id <> 7)")
            .unionByName(D.filter("ts < TIMESTAMP '2024-01-22'"))
            .distinct()
        )
        a = u.filter("(value <= 5.0e1) OR (event_type IN ('signup', 'view'))")
        b = u.filter("(event_id % 5) = 4")
        return a, b

    def group_count():
        a, b = sides()
        tagged = a.select("event_type", F.lit(1).alias("__v")).unionByName(
            b.select("event_type", F.lit(-1).alias("__v"))
        )
        return tagged.groupBy("event_type").count().count()

    a, b = sides()
    assert group_count() == 5
    expect_except = a.count() - a.filter("(event_id % 5) = 4").count()
    expect_intersect = a.filter("(event_id % 5) = 4").count()
    assert a.exceptAll(b).count() == expect_except
    assert a.intersectAll(b).count() == expect_intersect

    # the unsoundness is real on this Spark build: flipping the conf
    # back reproduces the split groups (only the cheap group-count
    # probe runs on this branch — review finding: the set-op jobs'
    # results were computed and discarded here)
    spark.conf.set("spark.sql.unionOutputPartitioning", "true")
    try:
        bad_groups = group_count()
    finally:
        spark.conf.set("spark.sql.unionOutputPartitioning", "false")
    assert bad_groups > 5, (
        "Spark's unionOutputPartitioning now appears sound on this "
        "build — consider re-enabling it after a full generative sweep"
    )


# ---------------------------------------------------------------------------
# Broadcast-hint policy (plans.auto_broadcast): hints only on
# contract-bounded relations; SF-growing tables must broadcast via
# Spark's own size checks so 100 TB SFs degrade to shuffle, not OOM.
# ---------------------------------------------------------------------------


def test_auto_broadcast_hint_gating(spark, sf_dir):
    from lime_etl_spark.plans import auto_broadcast

    def logical(df):
        return df._jdf.queryExecution().logical().toString()

    nation = read_table(spark, sf_dir, "nation")
    supp = read_table(spark, sf_dir, "supplier")
    # fixed-size dims get the hint
    assert "UnresolvedHint" in logical(auto_broadcast(nation, table="nation"))
    # SF-growing tables are refused, filtered or not
    assert "UnresolvedHint" not in logical(auto_broadcast(supp, table="supplier"))
    assert "UnresolvedHint" not in logical(
        auto_broadcast(supp.filter(F.col("s_acctbal") < 0), table="supplier")
    )
    # caller-declared contract bounds get the hint
    assert "UnresolvedHint" in logical(auto_broadcast(supp.limit(3), bounded=True))
    # no provenance, no bound -> no hint
    assert "UnresolvedHint" not in logical(auto_broadcast(supp))


def test_sf_growing_tables_unhinted_still_broadcast(spark, sf_dir):
    """The r9 verdict's q5 contradiction, pinned: every TPC-H-shape
    registry query hints ONLY its fixed-size dims (nation/region —
    counted as resolved broadcast-hint strategies in the optimized
    logical plan), yet the physical plan still contains MORE
    BroadcastHashJoins than hints — i.e. Spark's size-based planning
    (static parquet stats + AQE) picks the supplier/part broadcast on
    its own at fixture SFs, and at 100 TB SFs the same plan falls back
    to a shuffle join instead of broadcasting a multi-GB table."""
    expected_hints = {
        "q3_shipping_priority": 0,  # customer unhinted (r10: the knob
        # broadcast_right=True was the same defect behind a different
        # spelling — customer grows with SF)
        "q5_region_revenue": 2,   # nation, region
        "q7_nation_volume": 2,    # nation x2 (cust/supp roles)
        "q9_profit_by_nation_year": 1,  # nation
        "q14_promo_revenue": 0,   # part unhinted
        "q19_bracketed_revenue": 0,  # part unhinted
        "q2_min_cost_supplier": 2,   # nation, region
        "q16_supplier_count_by_part": 0,  # part + supplier exclusion list
        "q20_dominant_suppliers": 1,  # nation
        "q8_market_share": 1,     # nation
    }
    for name, hints in expected_hints.items():
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        phys = _plan(df)
        got_hints = opt.count("strategy=broadcast")
        assert got_hints == hints, f"{name}: {got_hints} hints, want {hints}"
        bhj = phys.count("BroadcastHashJoin")
        assert bhj > hints, (
            f"{name}: only {bhj} BroadcastHashJoin for {hints} hints — "
            "size-based planning stopped broadcasting the SF-growing side"
        )


def test_knob_and_nonequi_hint_sites_unhinted_still_broadcast(spark, sf_dir):
    """The two r10 follow-on sites of the q5 defect class, pinned:

    - quality_constraint_report's FK probe used the analytics-knob
      spelling (``broadcast_dim`` defaulting True) to force-broadcast
      customer's key set — SF-growing, multi-GB at 100 TB SFs. Now
      ``broadcast_dim=False``: zero hints, and size-based planning
      still picks a broadcast LeftAnti at fixture SFs.
    - dedup_embedding_cosine force-broadcast the embeddings table into
      its non-equi all-pairs join. Now unhinted: zero hints, and the
      planner still picks BroadcastNestedLoopJoin at the fixture sizes
      the exact twin exists for.
    """
    fk = REGISTRY["quality_constraint_report"].spark_fn(spark, sf_dir)
    opt = fk._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("strategy=broadcast") == 0
    phys = _plan(fk)
    assert "BroadcastHashJoin" in phys and "LeftAnti" in phys, phys

    ap = REGISTRY["dedup_embedding_cosine"].spark_fn(spark, sf_dir)
    opt = ap._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("strategy=broadcast") == 0
    assert "BroadcastNestedLoopJoin" in _plan(ap)


def test_raw_broadcast_hint_only_in_policy_module():
    """Structural pin of the policy module's greppability claim: a raw
    ``F.broadcast(`` anywhere else in the package is a hint that
    bypassed the size-class gate — every call site must route through
    plans.auto_broadcast with either provenance (``table=``) or a
    caller-declared contract bound (``bounded=True`` + a comment
    stating the bound)."""
    import pathlib

    import lime_etl_spark

    pkg = pathlib.Path(lime_etl_spark.__file__).parent
    offenders = [
        str(p.relative_to(pkg))
        for p in sorted(pkg.rglob("*.py"))
        if p.name != "policy.py" and "F.broadcast(" in p.read_text()
    ]
    assert offenders == [], offenders
