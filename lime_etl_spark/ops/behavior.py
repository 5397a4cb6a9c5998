"""Behavioral / temporal analytics operators: cohort retention, ordered
funnels, SCD Type-2 history, and point-in-time (PIT) interval joins.

The reference (a pandas cron ETL, see SURVEY.md §2) has none of these;
they are the event-analytics surface any warehouse user expects next to
sessionization, built Spark-first:

- every per-user computation is a window or aggregate over
  ``partitionBy(user)`` — ONE hash exchange per query, reused across
  the chained window passes (same partition spec ⇒ Catalyst reuses the
  exchange and only re-sorts where the ordering differs);
- the cross-step / cross-cohort reductions run over already-aggregated
  inputs that are orders of magnitude smaller than the fact table
  (cohort-week × offset, or k funnel steps), so their shuffles are
  negligible at any scale;
- SCD2 history build is two window passes over the same key
  partitioning; the PIT join is an equi-join on the entity key with a
  band predicate on the validity interval — sort-merge on the key at
  scale, AQE skew-split if one entity is hot.

All timestamp arithmetic is done in integral micros or whole periods so
the DuckDB oracle twins match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lime_etl_spark.plans import auto_broadcast

# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of each
    user's first event; a user is retained in week-offset ``k`` if they
    have any event in the k-th week after their cohort week.

    Plan shape (scale-critical): the per-user first-event timestamp is
    a window ``min`` over ``partitionBy(user)`` — one shuffle of the
    fact table on the user key, no self-join. The distinct
    (cohort, offset, user) pass re-shuffles on a strictly coarser key
    set and partially aggregates map-side; the final
    (cohort, offset) rollup and the cohort-size join operate on
    #weeks × #offsets rows, so the size join is broadcast.

    Returns (cohort_week DATE, week_offset BIGINT, n_active BIGINT,
    n_cohort BIGINT, retention DOUBLE).
    """
    w = Window.partitionBy(user_col)
    first_ts = F.min(ts_col).over(w)
    enriched = events.select(
        F.date_trunc("week", first_ts).cast("date").alias("cohort_week"),
        (
            F.datediff(F.date_trunc("week", F.col(ts_col)).cast("date"),
                       F.date_trunc("week", first_ts).cast("date"))
            / 7
        ).cast("bigint").alias("week_offset"),
        F.col(user_col).alias("__user"),
    )
    active = (
        enriched.distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = active.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("n_cohort")
    )
    return (
        # bounded by the calendar, not by volume: one row per cohort week
        active.join(auto_broadcast(sizes, bounded=True), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered funnel
# ---------------------------------------------------------------------------


def _step_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    window_days: int | None,
) -> tuple[DataFrame, list[str]]:
    """One row per user with the earliest qualifying timestamp of each
    ordered step (__t0..__tk, NULL where the user never reached it) —
    the chained window mins over ONE reused partitionBy(user) exchange
    that funnel() and funnel_latencies() both reduce over."""
    w = Window.partitionBy(user_col)
    df = events
    ts = F.col(ts_col)
    step_cols: list[str] = []
    for i, s in enumerate(steps):
        col = f"__t{i}"
        cond = F.col(type_col) == F.lit(s)
        if i > 0:
            cond = cond & (ts > F.col(step_cols[i - 1]))
            if window_days is not None:
                cond = cond & (
                    ts <= F.col(step_cols[0]) + F.expr(f"INTERVAL {window_days} DAYS")
                )
        df = df.withColumn(col, F.min(F.when(cond, ts)).over(w))
        step_cols.append(col)
    per_user = df.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in step_cols]
    )
    return per_user, step_cols


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_days: int | None = None,
) -> DataFrame:
    """Ordered-step funnel: per user, step ``i`` counts only if it
    occurs strictly after that user's step ``i-1`` completion (earliest
    qualifying occurrence); with ``window_days``, every later step must
    also land within that many days of the step-1 anchor.

    Plan shape: the chained "earliest qualifying ts" columns are window
    ``min``s over the SAME ``partitionBy(user)`` spec — each step's
    predicate references the previous step's column, so Catalyst emits
    a chain of Window operators over one reused exchange; the fact
    table is shuffled on the user key exactly once. The per-user rows
    then collapse to one row per user (map-side partial agg) and the
    final reduction is over k step-counts — driver-trivial.

    Returns (step_idx BIGINT, step STRING, n_users BIGINT,
    pct_of_first DOUBLE, pct_of_prev DOUBLE) ordered by step_idx.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user, step_cols = _step_times(
        events, steps, user_col, ts_col, type_col, window_days
    )
    return report_from_step_times(per_user, steps, step_cols)


def report_from_step_times(
    per_user: DataFrame, steps: Sequence[str], step_cols: Sequence[str]
) -> DataFrame:
    """Funnel report from a one-row-per-user step-time frame — shared by
    the batch funnel and the streaming maintainer
    (streaming/funnel.funnel_report), so counting and rate semantics
    (NULL rates on dead steps, not ANSI DIVIDE_BY_ZERO) live once."""
    counts = per_user.agg(
        *[
            # coalesce: a global sum over ZERO rows is NULL, not 0 —
            # an empty events table (or a funnel_report before any
            # batch ran) must report n_users = 0 per step, matching
            # the oracle's count(*) semantics (round-3 ADVICE)
            F.coalesce(
                F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"__n{i}")
            for i, c in enumerate(step_cols)
        ]
    )
    stacked = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("bigint").alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"__n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.*")
    wprev = Window.orderBy("step_idx")  # k rows total — single tiny partition is fine

    def _rate(denom):
        # a dead step (0 users) must yield NULL downstream rates, not a
        # DIVIDE_BY_ZERO under ANSI mode (found by the property test)
        return F.when(denom != 0, F.round(F.col("n_users") / denom, 6))

    return stacked.select(
        "step_idx",
        "step",
        "n_users",
        _rate(F.first("n_users").over(wprev)).alias("pct_of_first"),
        _rate(F.lag("n_users").over(wprev)).alias("pct_of_prev"),
    )


# ---------------------------------------------------------------------------
# SCD Type 2 from a change stream
# ---------------------------------------------------------------------------


def scd2_from_change_stream(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from an ordered
    change stream: consecutive rows with an unchanged state collapse
    into one version; each version carries ``valid_from`` (its first
    observation), ``valid_to`` (the next version's start, NULL while
    current), a per-key ``version`` number, and ``is_current``.

    Plan shape: two window passes over ``partitionBy(key)`` — a lag to
    detect state transitions, then lead/row_number over the (much
    smaller) transition rows. Same partition key throughout ⇒ one
    exchange of the input; the second window sorts the already-reduced
    versions. Linear at any scale; a hot key is bounded by that key's
    own change count, not the corpus.

    ``tiebreak_col`` must make (ts, tiebreak) unique per key so both
    engines order identically.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # null-safe transition detection: lag(lit(1)) marks the key's first
    # row (a NULL state can't fake it), eqNullSafe treats NULL as a
    # real state — A → NULL → A yields three versions, not a silently
    # erased NULL period
    changes = (
        df.withColumn("__first", F.lag(F.lit(1)).over(w).isNull())
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(state_col))
        )
        .select(key_col, state_col, ts_col, tiebreak_col)
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    fact_ts_col: str,
) -> DataFrame:
    """Point-in-time join: each fact row picks the SCD2 version whose
    validity interval contains its timestamp
    (``valid_from <= ts < valid_to``, open-ended for the current
    version). Facts with no covering version keep NULL state (left
    join) — the caller decides whether that is an error.

    Unlike the as-of join (which needs a per-fact row_number to pick
    the closest of many candidates), SCD2 intervals are disjoint per
    key, so the band predicate alone yields at most one match — no
    window pass. At scale this is a sort-merge equi-join on the key
    with the band as a residual filter; AQE splits skewed keys.
    """
    f, h = facts.alias("f"), history.alias("h")
    ts = F.col(f"f.{fact_ts_col}")
    cond = (
        (F.col(f"f.{key_col}") == F.col(f"h.{key_col}"))
        & (F.col("h.valid_from") <= ts)
        & (F.col("h.valid_to").isNull() | (ts < F.col("h.valid_to")))
    )
    return f.join(h, cond, "left").select(
        "f.*",
        F.col("h.state").alias("pit_state"),
        F.col("h.version").alias("pit_version"),
    )


def funnel_latencies(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_days: int | None = None,
) -> DataFrame:
    """Step-to-step conversion latency for the ordered funnel: for each
    consecutive step pair, over users who completed the later step,
    (n_converted, min/max/sum of the step gap in whole seconds).

    Exactness contract: every output is integer arithmetic on epoch
    micros (no float division), so the DuckDB twin matches bit-for-bit;
    consumers derive averages/rates from (sum, n). Same single
    user-key exchange as funnel() — the latency columns are one more
    projection over the already-computed step timestamps.

    ONE aggregation pass for all transitions: every leg's six stats
    are conditional aggregates in a single .agg() emitting one struct
    per transition, exploded into rows. The previous shape unioned
    len(steps)-1 independent global aggregations, so the per-user
    window chain and user-level groupBy re-ran over the full fact
    table once per transition — a 5-step funnel paid the expensive
    subtree four times.
    """
    if len(steps) < 2:
        raise ValueError("funnel_latencies needs at least two steps")
    per_user, step_cols = _step_times(
        events, steps, user_col, ts_col, type_col, window_days
    )
    legs = []
    for i in range(1, len(steps)):
        # whole seconds via integer division — no float anywhere
        gap = F.expr(
            f"(unix_micros(__t{i}) - unix_micros(__t{i - 1})) div 1000000"
        )
        converted = F.col(step_cols[i]).isNotNull()
        gap_if_converted = F.when(converted, gap)
        legs.append(
            F.struct(
                F.lit(f"{steps[i - 1]}->{steps[i]}").alias("transition"),
                F.lit(i).cast("bigint").alias("step_idx"),
                F.count(F.when(converted, F.lit(1)))
                .cast("bigint")
                .alias("n_converted"),
                F.min(gap_if_converted).alias("min_seconds"),
                F.max(gap_if_converted).alias("max_seconds"),
                F.sum(gap_if_converted).cast("bigint").alias("sum_seconds"),
            )
        )
    return (
        per_user.agg(F.array(*legs).alias("__legs"))
        .select(F.explode("__legs").alias("__leg"))
        .select("__leg.*")
    )
