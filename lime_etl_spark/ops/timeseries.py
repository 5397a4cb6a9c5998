"""Time-series operators over the events stream (north-star set).

The reference has no notion of time beyond a formatted date column
(lime_survey_orders_shipped.py date munging); real event analytics
needs the time-series surface: regularizing an irregular event stream
onto a dense grid (gap filling), carrying state across silent periods
(forward fill), and flagging outliers against each entity's own
trailing behavior (z-score anomalies).

Both operators are pure JVM window/array expressions with exact DuckDB
twins; both shuffle once on the entity key and scale linearly — the
dense grid is bounded by (active span / bucket) per entity, never a
global calendar cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "30 minutes",
    bucket_interval: str | None = None,
) -> DataFrame:
    """Per-entity dense time grid: one row for EVERY bucket between the
    entity's first and last event — zero-filled counts/sums, a gap
    flag, and the per-bucket average value forward-filled across the
    silent buckets (the 'last known reading' semantics dashboards and
    feature pipelines need).

    The grid step is DERIVED from ``bucket`` ("30 minutes" ⇒
    "INTERVAL 30 minutes"); ``bucket_interval`` stays overridable for
    interval forms Spark can't parse from the window string, but the
    two used to be independent required-matching parameters — a caller
    passing bucket="1 hour" with the old 30-minute interval default
    got a mis-phased grid where real buckets never joined, every other
    row read as a gap, and no error fired.

    Plan: one aggregation to buckets, a per-entity min/max, a
    sequence-explode onto the grid (bounded by the entity's own active
    span — not a corpus-wide calendar), a left join back, and one
    forward-fill window. Every wide step is keyed on the entity.
    """
    if bucket_interval is None:
        bucket_interval = f"INTERVAL {bucket}"
    w = F.window(ts_col, bucket)
    actual = (
        df.groupBy(F.col(user_col), w.alias("__w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
            F.round(F.avg(value_col), 4).alias("__bucket_avg"),
        )
        .select(user_col, F.col("__w.start").alias("bucket_start"),
                "n_events", "total_value", "__bucket_avg")
    )
    spans = actual.groupBy(user_col).agg(
        F.min("bucket_start").alias("__b0"), F.max("bucket_start").alias("__b1")
    )
    grid = spans.select(
        user_col,
        F.explode(
            F.expr(f"sequence(__b0, __b1, {bucket_interval})")
        ).alias("bucket_start"),
    )
    filled = grid.join(actual, [user_col, "bucket_start"], "left")
    ff = Window.partitionBy(user_col).orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        user_col,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        F.col("n_events").isNull().alias("is_gap"),
        F.last("__bucket_avg", ignorenulls=True).over(ff).alias("last_avg_value"),
    )


def zscore_anomalies(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    lookback: int = 20,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-event anomaly score against the SAME entity's trailing
    window: z = (x - mean) / std over the previous ``lookback`` events
    (current row excluded — the score never sees the value it judges).

    Events with fewer than 2 prior observations get a NULL score and
    are never flagged. A ZERO trailing std (constant history) also
    yields a NULL score — no finite z exists — but IS flagged whenever
    the value deviates from that constant: the flat-line-then-spike
    pattern is an anomaly at any threshold, not a division-by-zero
    blind spot.

    Exactness: avg()/stddev() over a SLIDING frame accumulate
    differently across engines (running add/remove vs segment trees),
    and 2-decimal inputs make frame means land on rounding boundaries
    constantly — even round() itself disagrees at .xxxx5 across
    engines (BigDecimal HALF_UP vs scaled rint). So NOTHING here is
    rounded: values are lifted to exact scaled integers
    (v100 = value·100, integral in the fixture and any currency-like
    column), frame sums of v100 and v100² are exact BIGINTs, and
    mean/std/z are computed from them in double with a fixed operation
    order — identical integer inputs + identical IEEE ops ⇒
    bit-identical full-precision outputs, no boundary roulette.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-lookback, -1)
    )
    v100 = F.round(F.col(value_col) * 100, 0).cast("bigint")
    n = F.count(value_col).over(w)
    s1 = F.sum(v100).over(w).cast("double")
    s2 = F.sum(v100 * v100).over(w).cast("double")
    mean = F.when(n >= 1, s1 / n / F.lit(100.0))
    var100 = (s2 - s1 * s1 / n) / (n - F.lit(1))
    std = F.when(
        n >= 2, F.sqrt(F.greatest(var100, F.lit(0.0))) / F.lit(100.0)
    )
    z = (F.col(value_col) - mean) / F.nullif(std, F.lit(0.0))
    # zero trailing std = a perfectly constant history; any deviation
    # from it is the most extreme anomaly possible (z is mathematically
    # infinite), but z computes as NULL — so the flag checks that case
    # explicitly instead of silently never firing on the textbook
    # flat-line-then-spike pattern. zscore itself stays NULL (there is
    # no finite score to report).
    flat_line_break = (std == F.lit(0.0)) & (F.col(value_col) != mean)
    return df.select(
        order_tiebreak,
        user_col,
        ts_col,
        value_col,
        mean.alias("trail_mean"),
        std.alias("trail_std"),
        z.alias("zscore"),
        F.coalesce(
            F.abs(z) >= z_threshold, flat_line_break, F.lit(False)
        ).alias("is_anomaly"),
    )
