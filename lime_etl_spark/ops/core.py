"""Core relational operators — the reference's full transform vocabulary.

Each function is a thin, typed, lazy wrapper over DataFrame ops; the
mapping to the reference is cited per function (SURVEY.md §2.3-§2.6).
Everything here is a narrow transformation except ``dedup_latest``
(one shuffle on the dedup key — the reference's only shuffle-shaped op).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Projections (P1-P3) and renames (P4)
# ---------------------------------------------------------------------------


def project(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Column projection, e.g. /root/reference/lime_survey_nps.py:54.

    Declarative select ⇒ Catalyst prunes the scan down to these columns
    (ReadSchema in the physical plan shows only them).
    """
    return df.select(*columns)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Dict-based rename, e.g. q01→nps (/root/reference/lime_survey_nps.py:57-68)."""
    return df.withColumnsRenamed(dict(mapping))


# ---------------------------------------------------------------------------
# Filters (F1-F4)
# ---------------------------------------------------------------------------


def drop_null_any(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """``dropna(how='any', subset=...)`` parity.

    Reference: subset form at /root/reference/lime_survey_nps.py:70,
    all-columns form at lime_survey_returns.py:58. NOTE the parity pin
    (SURVEY.md §7): pandas keeps empty-string ``""`` as non-null and so
    does Spark — no ""→NULL normalization is applied here; use
    ``normalize_empty_to_null`` explicitly when wanted.
    """
    return df.na.drop(how="any", subset=subset)


def normalize_empty_to_null(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Optional explicit ""→NULL normalization (opt-in, not reference parity)."""
    cols = subset or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    return df.withColumns(
        {c: F.when(F.col(c) == "", None).otherwise(F.col(c)) for c in cols}
    )


def filter_isin(df: DataFrame, column: str, allowed: Iterable) -> DataFrame:
    """Set-membership whitelist (/root/reference/lime_survey_orders_shipped.py:73)."""
    return df.filter(F.col(column).isin(list(allowed)))


def filter_ge_literal(df: DataFrame, column: str, literal) -> DataFrame:
    """>= literal predicate — the idempotency-window shape
    (/root/reference/lime_survey_nps.py:111). The reference compares
    varchar lexicographically; on string columns this does the same.
    """
    return df.filter(F.col(column) >= F.lit(literal))


# ---------------------------------------------------------------------------
# Scalar cleaning functions (X1-X3)
# ---------------------------------------------------------------------------


def clean_numeric(df: DataFrame, column: str, strip_pattern: str, out: str | None = None) -> DataFrame:
    """Strip a regex then cast to double.

    X1: ``float(re.sub("A|N","",x))`` (/root/reference/lime_survey_nps.py:73)
    → ``regexp_replace + try_cast`` — stays inside whole-stage codegen
    instead of a row-at-a-time Python lambda. try_cast (not cast): under
    ANSI mode (Spark 4 default) a malformed value like ``""`` would fail
    the job, where the reference's ``float(...)`` would raise too — the
    engine's documented deviation is null-on-malformed, so one dirty row
    can't kill a 100 TB job.
    X2 is the same with pattern "A" (lime_survey_returns.py:72).
    """
    from lime_etl_spark.functions import strip_and_cast_double

    # ONE definition of the X1/X2 expression (functions.py) — this body
    # used to re-implement it verbatim, a silent-drift pair
    out = out or column
    return df.withColumn(out, strip_and_cast_double(column, strip_pattern))


def with_audit_ts(df: DataFrame, run_ts: str, column: str = "updated_ts") -> DataFrame:
    """Run-level audit timestamp literal.

    The reference computes ``now()`` ONCE on the driver so all rows share
    the value (/root/reference/lime_survey_nps.py:69). A per-row
    ``current_timestamp()`` would be nondeterministic across retries, so
    the engine requires the caller to pin ``run_ts`` explicitly.
    """
    return df.withColumn(column, F.lit(run_ts))


# ---------------------------------------------------------------------------
# Sort / dedup (O1-O2) — the reference's only window-shaped operator
# ---------------------------------------------------------------------------


def dedup_latest(
    df: DataFrame,
    key: str | list[str],
    order_by: str | list[str],
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Keep the latest row per key, deterministically.

    Reference: sort by (order_number, date_sent) then
    ``drop_duplicates(subset='order_number', keep='last')``
    (/root/reference/lime_survey_orders_shipped.py:69-70). pandas
    quicksort is unstable so reference ties are nondeterministic;
    the engine pins a tiebreak (descending) so re-runs agree.

    Implementation: row_number over Window.partitionBy(key)
    .orderBy(order desc, tiebreak desc) == 1. One shuffle on the key;
    at 100 TB this is the right plan — Spark's window exec sorts within
    partitions after a hash exchange, no global sort (the reference's
    global sort_values is strictly more work than needed).
    """
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in orders], *[F.col(c).desc() for c in ties]
    )
    # collision-proof working column: a caller's own '__rn' used to be
    # silently overwritten and then dropped from the output
    rn = "__rn"
    while rn in df.columns:
        rn = "_" + rn
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def sort_rows(df: DataFrame, by: list[str], ascending: list[bool] | None = None) -> DataFrame:
    """Multi-key sort (/root/reference/lime_survey_orders_shipped.py:69).

    Global sort = range-partition shuffle; at scale only use for final
    presentation or as input to write-ordered files, never mid-pipeline
    (dedup_latest does NOT need it — see its docstring).
    """
    ascending = ascending or [True] * len(by)
    if len(ascending) != len(by):
        # zip() would silently TRUNCATE to the shorter list, dropping
        # sort keys and producing a wrong order with no error
        raise ValueError(
            f"sort_rows: {len(by)} sort columns but {len(ascending)} "
            "ascending flags"
        )
    cols: list[Column] = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in zip(by, ascending)
    ]
    return df.orderBy(*cols)


def to_stringly(df: DataFrame) -> DataFrame:
    """Cast every column to string — landing-mode parity with the
    reference's all-varchar(256) warehouse tables
    (/root/reference/lime_survey_nps.py:120-132). Doubles format with
    their decimal point (3.0), matching pandas' CSV of float columns.
    """
    # cast(NULL as string) is already NULL — no CaseWhen guard needed
    return df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])


# ---------------------------------------------------------------------------
# Snapshot diff (incremental corpus delta)
# ---------------------------------------------------------------------------


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Keyed delta between two table snapshots: one row per key whose
    content changed — ``change`` ∈ added | removed | changed (unchanged
    keys are dropped; they are the bulk at 100 TB and carrying them
    defeats the point of a delta).

    Content identity is an md5 fingerprint over ``compare_cols`` (unit-
    separator-joined, NULLs mapped to a chr(1) sentinel — NUL is not
    portable to every oracle engine — so ("a", NULL) never
    collides with ("a", "")). The whole op is two narrow fingerprint
    projections and ONE full-outer shuffle join on the key — at scale,
    store snapshots bucketed by the key and even that shuffle
    disappears. This is the recurring-crawl primitive: diff snapshot N
    against N-1, reprocess only `added`+`changed`, tombstone `removed`.
    """
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")

    def fingerprint(df: DataFrame, out: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x01<NULL>")) for c in compare_cols
        ]
        return df.select(F.col(key), F.md5(F.concat_ws("\x1f", *parts)).alias(out))

    o = fingerprint(old, "fp_old")
    n = fingerprint(new, "fp_new")
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(key, "change")
    )
