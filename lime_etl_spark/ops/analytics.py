"""Relational analytics operators (SURVEY.md §2.7).

The reference has no joins/aggregations/windows/set-ops at all (its
three pipelines are single-table); this module supplies the full
analytics surface a user of a query engine expects, as thin declarative
wrappers that keep Catalyst in charge of physical strategy.

Scale rules baked in:
- joins take an optional ``broadcast_right`` hint; dimension tables in
  schemas.BROADCAST_TABLES should always be broadcast — a 100-row
  region table must never cause a shuffle of a 100 TB fact table;
- aggregations rely on hash-agg partial/final (map-side combine is
  automatic); ``approx_count_distinct`` is exposed next to the exact
  version because exact distinct over 100 TB is a full shuffle of keys;
- top-k per group uses row_number over a window, NOT a global sort —
  one hash-partition shuffle, in-partition sort only;
- global top-n (``sort_topn``) is orderBy+limit, which Spark executes
  as TakeOrderedAndProject — per-partition heaps + driver merge of k
  rows, no global sort shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lime_etl_spark.plans import auto_broadcast

# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

JOIN_TYPES = {
    "inner", "left", "right", "full", "left_semi", "left_anti", "cross",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Standard equi/non-equi join with an explicit broadcast knob.

    ``broadcast_right=True`` pins a broadcast-hash-join; otherwise
    Catalyst/AQE picks (sort-merge for large-large, broadcast when the
    build side is under the threshold, runtime-switched by AQE).
    """
    if how not in JOIN_TYPES:
        raise ValueError(f"unknown join type {how!r}")
    if broadcast_right:
        # the knob IS the caller's bounded-by-contract declaration —
        # never set it on an SF-growing side (plans.auto_broadcast)
        right = auto_broadcast(right, bounded=True)
    return left.join(right, on, how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (backward) or earliest with >= (forward),
    per key. ``left_id`` must uniquely identify left rows (window
    partition key); ``right_tiebreak`` pins ties on right_ts.

    Spark lacks a native as-of join; this is the composition path
    (SURVEY.md §2.7): range-join on key + ts inequality, then keep the
    closest match per left row via row_number. At scale the range join
    is a sort-merge on the key; skewed keys fall to AQE skew handling.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & (
        rt <= lt if direction == "backward" else rt >= lt
    )
    joined = left.alias("l").join(right.alias("r"), cond, "left")
    order = [rt.desc() if direction == "backward" else rt.asc()]
    if right_tiebreak:
        order.append(F.col(f"r.{right_tiebreak}").desc())
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    spread_col: str | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join: the (large, skewed) left side gets a
    deterministic salt derived from its full row hash; the (smaller)
    right side is replicated ``salt`` ways. The shuffle key becomes
    (key, salt-bucket), splitting a hot key's rows across ``salt``
    reducers instead of one straggler.

    AQE's skew-join handles most cases at runtime; explicit salting
    remains for aggregation-under-join pipelines AQE can't split and for
    deterministic plan shape. Deterministic salt (hash of row, not
    rand()): retries and re-runs place rows identically, with no
    indeterminate-stage rollback on fetch failure.

    SHARP EDGE of any deterministic salt: rows that are byte-identical
    ACROSS ALL COLUMNS are indistinguishable, so they necessarily land
    in one bucket — a raw at-least-once event log whose hot-key rows
    are exact duplicates re-concentrates in a single reducer. No
    deterministic function can spread them; run dedup_exact (or a
    pre-aggregation) first if that shape is possible in the input.
    Pass ``spread_col`` (a unique or near-unique column: event id,
    offset) to salt on hash(key, spread_col) instead of the whole row
    — same determinism, one hash input instead of every column of a
    wide row. The join RESULT is identical under any salt choice (the
    right side is replicated across every bucket); only the physical
    row placement changes.
    """
    if how not in {"inner", "left"}:
        raise ValueError("salted_join supports inner/left joins")
    salt_inputs = (
        [F.col(key), F.col(spread_col)]
        if spread_col is not None
        else [F.col(c) for c in left.columns]
    )
    lsalt = F.pmod(F.xxhash64(*salt_inputs), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


def group_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """groupBy().agg() — hash aggregate with automatic partial/final."""
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg: Column,
    out: str,
) -> DataFrame:
    """Cumulative aggregate (unbounded preceding → current row)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, agg.over(w))


def moving_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg: Column,
    out: str,
    preceding: int,
    following: int = 0,
) -> DataFrame:
    """Sliding row-frame aggregate (e.g. 3-row moving average)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )
    return df.withColumn(out, agg.over(w))


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via row_number — one shuffle, no global sort.

    ``order_by`` must totally order rows within each group (append a key
    tiebreak) or results are nondeterministic.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def lag_lead_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    col: str,
    out_prefix: str = "",
) -> DataFrame:
    """lag/lead + delta against the previous row per partition."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    p = out_prefix
    return (
        df.withColumn(f"{p}prev", F.lag(col).over(w))
        .withColumn(f"{p}next", F.lead(col).over(w))
        .withColumn(f"{p}delta", F.col(col) - F.col(f"{p}prev"))
    )


# ---------------------------------------------------------------------------
# Set operations / sorts / limits
# ---------------------------------------------------------------------------


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=True)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=True).distinct()


def intersect(a: DataFrame, b: DataFrame, keep_dups: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_dups else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_dups: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_dups else a.subtract(b)


def sort_topn(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """Global top-n: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), not a full sort shuffle. order_by needs a
    total-order tiebreak for determinism."""
    return df.orderBy(*order_by).limit(n)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key — multi-column data skipping
# ---------------------------------------------------------------------------


def zorder_bucket(col: str, cmin: str, cmax: str, bits: int = 16) -> Column:
    """Map an integer-valued column into [0, 2^bits) by min/max scaling,
    in PURE INTEGER math — ``((x - min) * (2^bits - 1)) div (max - min)``
    — so the bucket is bit-identical across engines: SQL ``div`` is
    exact int64 division, where a float path would misplace values near
    bucket boundaries once the scaled numerator exceeds 2^53. Arguments
    are SQL expression strings (encode non-integers first: decimals as
    scaled ints, dates as epoch days); a constant column (max == min)
    buckets to 0. Caller guarantees (span) * (2^bits) fits in int64.

    Linear min/max scaling assumes a roughly uniform dimension; for a
    heavily skewed one (power-law doc lengths), pre-transform upstream
    (log-scale, or rank-encode via ntile) so buckets carry information
    — otherwise most rows collapse into a few buckets and that
    dimension stops contributing to file pruning.
    """
    top = (1 << bits) - 1
    lo, hi = f"CAST(({cmin}) AS BIGINT)", f"CAST(({cmax}) AS BIGINT)"
    return F.expr(
        f"CASE WHEN {hi} - {lo} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(({col}) AS BIGINT) - {lo}) * {top} div ({hi} - {lo}) END"
    )


def zorder_key(bucket_cols: "Sequence[Column]", bits: int = 16) -> Column:
    """Interleave pre-bucketed integer columns' bits into one Morton
    (Z-order) key: bit i of column j lands at position ``i*ncols + j``.
    Sorting/range-clustering on this key keeps EVERY dimension's values
    locally compact, so parquet min/max file stats prune on any of the
    clustered columns — the multi-column upgrade of single-key range
    clustering (write_parquet_clustered), which leaves every other
    column's per-file range spanning the whole domain.

    The key is a sum of ``bits * ncols`` shift/mask terms — pure JVM
    expressions inside whole-stage codegen, no UDF. ncols * bits must
    be <= 63.
    """
    cols = list(bucket_cols)
    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError(f"zorder key needs {ncols * bits} bits; max 63")
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)), i * ncols + j
            )
    return key.cast("bigint")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_id: str,
    r_id: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval-overlap join: pairs (l, r) sharing ``key`` whose CLOSED
    timestamp intervals [l_start, l_end] and [r_start, r_end] overlap.
    Returns key, both ids, both interval bounds, and the exact
    ``overlap_seconds`` (integer micros arithmetic).

    Spark has no native range-join optimization, and the naive
    key-equi-join with a band residual goes quadratic in intervals per
    key. This is the binned form: each interval explodes into the
    ``bin_seconds`` time buckets it touches, the join runs on
    (key, bucket) — so candidate pairs are bounded by co-resident
    intervals per bucket, not per key — and each overlapping pair is
    emitted EXACTLY ONCE by keeping only the pair's first common
    bucket (max of the two start buckets) instead of a distinct pass:
    one equi-join, zero dedup shuffles. Bin explosion is bounded by
    interval-span / bin_seconds — pick bin_seconds near the typical
    interval length.
    """
    bin_us = bin_seconds * 1_000_000

    def binned(df, start, end, side):
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start}) div {bin_us}"),
                    F.expr(f"unix_micros({end}) div {bin_us}"),
                )
            ),
        ).withColumn(f"__{side}_sbin", F.expr(f"unix_micros({start}) div {bin_us}"))

    lb = binned(left, l_start, l_end, "l")
    rb = binned(right, r_start, r_end, "r")
    joined = lb.join(rb, [key, "__bin"]).filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        # first-common-bin: emit each overlapping pair exactly once
        & (F.col("__bin") == F.greatest("__l_sbin", "__r_sbin"))
    )
    overlap = F.expr(
        f"(unix_micros(least({l_end}, {r_end}))"
        f" - unix_micros(greatest({l_start}, {r_start}))) div 1000000"
    )
    return joined.select(
        key, l_id, r_id, l_start, l_end, r_start, r_end,
        overlap.cast("bigint").alias("overlap_seconds"),
    )
