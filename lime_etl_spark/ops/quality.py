"""Declarative data-quality constraint checks (expectations).

The reference trusts its inputs blindly (its pipelines drop NA rows and
move on); a production warehouse wants the constraint layer: declare
rules, get a violations report, gate the load on it. Rules are
evaluated Spark-first:

- all ROW-LEVEL rules (not_null / accepted_values / in_range) compile
  into ONE aggregate pass over the table — a single scan, map-side
  partial sums, no shuffle beyond the final 1-row reduce;
- ``unique`` needs the key-grouped counts: one hash exchange on the
  key columns (the minimum possible for the question);
- ``foreign_key`` is a left-anti join against the dimension's key
  column — broadcast when the dimension is small (the hint mirrors
  schemas.BROADCAST_TABLES discipline), shuffle otherwise.

Every rule yields (rule, column, n_violations); gate with
``violations.filter("n_violations > 0")``.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window, functions as F

from lime_etl_spark.plans import auto_broadcast


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str
    # rule-specific payload (accepted values / bounds / dim)
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    dim: DataFrame | None = field(default=None, compare=False)
    dim_key: str | None = None
    broadcast_dim: bool = True

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def accepted_values(column: str, values: Sequence) -> Rule:
    return Rule("accepted_values", column, values=tuple(values))


def in_range(column: str, lo: float | None = None, hi: float | None = None) -> Rule:
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    return Rule("in_range", column, lo=lo, hi=hi)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def foreign_key(
    column: str, dim: DataFrame, dim_key: str, broadcast_dim: bool = True
) -> Rule:
    """Referential-integrity rule: rows whose ``column`` is non-NULL but
    absent from ``dim[dim_key]`` count as violations (left-anti probe).

    ``broadcast_dim`` is the caller's bounded-by-contract declaration
    (plans.auto_broadcast): the default True suits fixed-cardinality
    dimensions (currencies, countries, enum tables). Pass ``False`` for
    a dim that GROWS with data volume — e.g. checking orders against
    customer, whose distinct key set is multi-GB at a 100 TB scale
    factor — so size-based planning can degrade the probe to a shuffle
    anti-join instead of OOMing on a forced broadcast."""
    return Rule(
        "foreign_key", column, dim=dim, dim_key=dim_key, broadcast_dim=broadcast_dim
    )


def _row_violation(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        # NULL is not_null's concern, not membership's
        return c.isNotNull() & ~c.isin(*rule.values)
    if rule.kind == "in_range":
        cond = F.lit(False)
        if rule.lo is not None:
            cond = cond | (c < F.lit(rule.lo))
        if rule.hi is not None:
            cond = cond | (c > F.lit(rule.hi))
        return c.isNotNull() & cond
    raise ValueError(f"not a row-level rule: {rule.kind}")


def validate(
    df: DataFrame, rules: Sequence[Rule], with_row_count: bool = False
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → (rule, column, n_violations).

    Row-level rules share one aggregate scan; each unique/foreign_key
    rule adds its own (unavoidable) keyed pass. Results are unioned —
    each leg is a 1-row (or tiny) aggregate, so the union is free.

    ``with_row_count`` appends a ('row_count', '*', count(*)) report row
    computed inside the SAME fused scan — pipelines that want both the
    gate and a total (audit counts) pay one pass, not two.
    """
    legs: list[DataFrame] = []
    row_rules = [r for r in rules if r.kind in ("not_null", "accepted_values", "in_range")]
    if row_rules or with_row_count:
        # coalesce: a global sum over ZERO rows is NULL, and an empty
        # table violates nothing
        sums = [
            F.coalesce(F.sum(F.when(_row_violation(r), 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        entries = [
            F.struct(
                F.lit(r.kind).alias("rule"),
                F.lit(r.column).alias("column"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, r in enumerate(row_rules)
        ]
        if with_row_count:
            sums.append(F.count(F.lit(1)).cast("bigint").alias("__rc"))
            entries.append(
                F.struct(
                    F.lit("row_count").alias("rule"),
                    F.lit("*").alias("column"),
                    F.col("__rc").alias("n_violations"),
                )
            )
        legs.append(
            df.agg(*sums)
            .select(F.explode(F.array(*entries)).alias("r"))
            .select("r.*")
        )
    for r in rules:
        if r.kind == "unique":
            dups = (
                df.filter(F.col(r.column).isNotNull())
                .groupBy(r.column)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_violations"))
            )
            legs.append(
                dups.select(
                    F.lit("unique").alias("rule"),
                    F.lit(r.column).alias("column"),
                    "n_violations",
                )
            )
        elif r.kind == "foreign_key":
            dim_keys = r.dim.select(F.col(r.dim_key).alias(r.column)).distinct()
            if r.broadcast_dim:
                # the knob IS the caller's bounded-by-contract declaration
                # (see foreign_key's docstring: False for SF-growing dims)
                dim_keys = auto_broadcast(dim_keys, bounded=True)
            orphans = (
                df.filter(F.col(r.column).isNotNull())
                .join(dim_keys, r.column, "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            )
            legs.append(
                orphans.select(
                    F.lit("foreign_key").alias("rule"),
                    F.lit(r.column).alias("column"),
                    "n_violations",
                )
            )
    if not legs:  # no rules at all: an empty report, not an IndexError
        return df.sparkSession.createDataFrame(
            [], "rule string, column string, n_violations bigint"
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


class QualityError(ValueError):
    """A constraint gate failed; carries the per-rule violation counts."""

    def __init__(self, failures: list[tuple[str, str, int]]):
        self.failures = failures
        detail = ", ".join(f"{rule}({col})={n}" for rule, col, n in failures)
        super().__init__(f"quality gate failed: {detail}")


def gate(
    df: DataFrame,
    rules: Sequence[Rule],
    max_violations: int = 0,
    with_row_count: bool = False,
) -> DataFrame | int:
    """Evaluate ``rules`` and RAISE (QualityError, with per-rule counts)
    if any rule exceeds ``max_violations``; otherwise return ``df``
    unchanged — the load-gate form of ``validate`` for pipelines.

    ``with_row_count=True`` returns count(*) instead of ``df`` — rides
    the validate scan, so a pipeline that gates AND audits its input
    size pays one pass (see pipelines/corpus.py).

    The report is rules-many rows, so the collect is O(#rules)."""
    report = validate(df, rules, with_row_count=with_row_count).collect()
    failures = [
        (r["rule"], r["column"], r["n_violations"])
        for r in report
        if r["rule"] != "row_count" and r["n_violations"] > max_violations
    ]
    if failures:
        raise QualityError(failures)
    if with_row_count:
        return next(r["n_violations"] for r in report if r["rule"] == "row_count")
    return df


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution drift of a numeric column between two snapshots:
    equal-width bins anchored on the REFERENCE min/max (plus one
    underflow/overflow bin at each end for current-only mass), per-bin
    counts from both sides, and the scaled total-variation distance.

    Why TVD and not PSI/KL: those need ln(), whose last bits differ
    across engines' libm; TVD over bin counts is computable in EXACT
    integer cross-products — |n_ref_bin·N_cur − n_cur_bin·N_ref| sums
    exactly in DECIMAL(38), and only the final normalization
    (· 1/(2·N_ref·N_cur)) is one deterministic double division — so the
    whole report is oracle-exact. tvd ∈ [0,1]: 0 = identical binned
    distributions, 1 = disjoint; NULL (not NaN) when either snapshot is
    empty — there is no distribution to compare, and an explicit NULL
    can't silently pass a ``tvd > threshold`` alert the way 0/0 NaN
    would.

    Plan shape: one aggregate on ref for (lo, hi, N) broadcast as a
    single row; one groupBy(bin) per side (map-side combined over
    ≤ n_bins+2 keys); the join of the two tiny bin tables is free, and
    the totals/TVD roll-up is a pair of unbounded WINDOW sums over the
    joined bin table so it is referenced exactly once (an agg+crossJoin
    pyramid re-referenced the scan+bin subtrees 12× and leaned on AQE
    stage reuse to dedup them at runtime). Three scans total, by
    structure rather than by reuse: the ref min/max grid plus one
    binning pass per snapshot (the stats broadcast is shared by both
    sides).

    Returns one row per occupied bin: (bin BIGINT, n_ref BIGINT,
    n_cur BIGINT, tvd DOUBLE — the same total repeated per row so a
    single-row consumer can filter bin = -1 … or read any row).
    Bin -1 = underflow, n_bins = overflow (vs the ref range). If the
    reference snapshot is EMPTY there is no bin grid at all: current
    rows bin to NULL (and tvd is NULL) — explicit "nothing to compare
    against", never a histogram that pretends the mass sits in a bin.
    """
    stats = ref.agg(
        F.min(column).alias("__lo"),
        F.max(column).alias("__hi"),
        F.count(column).cast("bigint").alias("__nref"),
    )

    def binned(df, side):
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        raw = F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
            F.floor((F.col(column) - F.col("__lo")) / width)
        )
        b = (
            # an EMPTY reference defines no bin grid: current-side rows
            # bin to NULL ("no grid"), not to n_bins-1 — least() skips
            # NULL args, so the raw NULL used to collapse ALL current
            # mass into the top bin, a silently wrong histogram even
            # though tvd was already correctly NULL
            F.when(F.col("__lo").isNull(), F.lit(None).cast("bigint"))
            .when(F.col(column) < F.col("__lo"), F.lit(-1))
            .when(F.col(column) > F.col("__hi"), F.lit(n_bins))
            .otherwise(F.least(raw, F.lit(n_bins - 1)))
        )
        return (
            df.filter(F.col(column).isNotNull())
            .crossJoin(auto_broadcast(stats, bounded=True))  # 1-row min/max
            .select(b.cast("bigint").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_{side}"))
        )

    r = binned(ref, "ref")
    c = binned(cur, "cur")
    joined = (
        r.join(c, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # Totals and the TVD numerator are WINDOW sums over the bin table,
    # not a tot→totals→final agg+crossJoin pyramid (round 10, second
    # pass): each pyramid level re-referenced `joined`, so the INITIAL
    # plan repeated the full scan+bin subtrees 12× under the tiny
    # broadcast builds. Measured at runtime, AQE's stage cache did
    # collapse those back to 3 snapshot scans — but only because the
    # repeated subtrees canonicalize equal, a property one stray alias
    # or non-deterministic expression silently breaks, and the executed
    # plan still carried 7 joins and 5 re-referenced broadcast builds.
    # With `joined` referenced exactly once the single-scan-per-side
    # property is STRUCTURAL (3 scans, 3 joins, measured), the plan is
    # O(n_bins) instead of O(levels × sides), and nothing depends on
    # stage-reuse firing. The unbounded window moves all rows to one
    # partition, which is the bounded ≤ n_bins+2 bin table — not data.
    # Decimal semantics unchanged: sum(bigint)→bigint cast to
    # decimal(38,0), exact integer cross-products, same final double
    # division.
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    with_tot = joined.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w_all).cast("decimal(38,0)").alias("__tr"),
        F.sum("n_cur").over(w_all).cast("decimal(38,0)").alias("__tc"),
    )
    with_num = with_tot.withColumn(
        "__num",
        F.sum(
            F.abs(
                F.col("n_ref").cast("decimal(38,0)") * F.col("__tc")
                - F.col("n_cur").cast("decimal(38,0)") * F.col("__tr")
            )
        ).over(w_all),
    )
    return with_num.select(
        "bin",
        "n_ref",
        "n_cur",
        # an EMPTY snapshot has no distribution to compare against:
        # tvd is explicitly NULL (documented undefined), never a 0/0 NaN
        # that would silently pass a `tvd > threshold` alert
        F.when(
            (F.col("__tr") > 0) & (F.col("__tc") > 0),
            F.col("__num").cast("double")
            / (F.lit(2.0) * F.col("__tr").cast("double") * F.col("__tc").cast("double")),
        ).alias("tvd"),
    )
