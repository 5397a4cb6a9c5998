"""Incremental data-quality monitoring over a stream (quality-at-ingest).

Batch `ops/quality.validate` answers "how many violations does THIS
table hold"; an ingest pipeline wants the online form: every
micro-batch is validated as it lands, per-batch reports accumulate,
and the CUMULATIVE report stays equal to a batch `validate` over
everything ingested so far — without re-scanning the corpus. This is
the gate a training-data pipeline puts in front of its raw zone: junk
spikes show up per batch (the ``timeline``), and the corpus-level
contract stays continuously known (the ``report``).

Why the recurrence is EXACT: every supported rule is SUM-decomposable
over row-disjoint batches —

- row-level rules (not_null / accepted_values / in_range) count
  violating rows, so corpus count = Σ batch counts;
- ``row_count`` likewise;
- ``foreign_key`` against a STATIC dimension: each row is an orphan or
  not independently of other fact rows.

``unique`` is NOT sum-decomposable (a key unique within every batch
can still collide across batches) and is rejected with an actionable
error — cross-batch uniqueness at ingest is exactly what
streaming/dedup.py's keyed state solves; point key-dedup there.

State model (the idempotency design shared by streaming/scd2, funnel,
dedup): one tiny report per batch — (rule, column, n_violations,
ingest_batch), a handful of rows — written with a dynamic partition
overwrite keyed on the micro-batch id, so replays converge. Per-batch
cost is ONE fused aggregate scan of the batch (plus one anti-join per
foreign_key rule); read-side ``report()`` is a groupBy over
rules × batches — trivially small.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lime_etl_spark.io import sinks
from lime_etl_spark.ops import quality
from lime_etl_spark.streaming.state import read_state_or_empty as _read_or_empty

REPORT_SUBDIR = "quality_report"

_REPORT_SCHEMA = (
    "rule string, column string, n_violations bigint, ingest_batch bigint"
)


def _check_rules(rules: Sequence[quality.Rule]) -> None:
    seen: set[tuple[str, str]] = set()
    for r in rules:
        if r.kind == "unique":
            raise ValueError(
                "unique(...) is not sum-decomposable across micro-batches "
                "(per-batch uniqueness does not imply corpus uniqueness); "
                "use streaming/dedup.py's keyed ingest state for cross-batch "
                "key dedup, or run the batch validate() over the corpus"
            )
        # the report state keys rows by (rule kind, column): two rules of
        # the same kind on the same column (e.g. two in_range bounds)
        # would SILENTLY merge into one summed row in report() while the
        # batch validate keeps them as two (already-ambiguous) rows —
        # found by the generative streaming harness (round 8). Refuse
        # loudly; distinct bounds belong in one in_range(lo=, hi=) rule
        # or in separate monitors.
        key = (r.kind, r.column)
        if key in seen:
            raise ValueError(
                f"duplicate rule {r.kind}({r.column}): the cumulative "
                "report keys violations by (rule, column), so same-kind "
                "rules on one column are indistinguishable; combine the "
                "bounds into one rule or monitor them separately"
            )
        seen.add(key)


def process_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    rules: Sequence[quality.Rule],
    with_row_count: bool = True,
) -> None:
    """Validate one micro-batch and append its report — see module doc.

    Pure function of (batch, rules); the write is a partition overwrite
    keyed on ``batch_id``, so replays converge.

    Stricter than batch ``validate``: two same-kind rules on one column
    (e.g. two ``in_range`` bounds) are REFUSED with ValueError — the
    cumulative report keys violations by (rule, column), so such rules
    would silently merge into one summed row (round-8 generative find).
    Batch ``validate`` still accepts them; combine the bounds into one
    rule or monitor them separately.
    """
    _check_rules(rules)
    rep = quality.validate(batch, rules, with_row_count=with_row_count)
    sinks.idempotent_reload(
        rep.withColumn("ingest_batch", F.lit(batch_id)),
        os.path.join(state_dir, REPORT_SUBDIR),
        "ingest_batch",
    )


def timeline(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-batch violation counts — (ingest_batch, rule, column,
    n_violations): the drift-over-time view a monitor alerts on."""
    return _read_or_empty(
        spark, os.path.join(state_dir, REPORT_SUBDIR), _REPORT_SCHEMA
    ).select("ingest_batch", "rule", "column", "n_violations")


def report(spark: SparkSession, state_dir: str) -> DataFrame:
    """Cumulative report — (rule, column, n_violations), equal to the
    batch ``validate`` over every row ingested so far (equivalence
    tested multi-batch and under replay)."""
    return (
        timeline(spark, state_dir)
        .groupBy("rule", "column")
        .agg(F.sum("n_violations").cast("bigint").alias("n_violations"))
    )


def monitor_quality(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    rules: Sequence[quality.Rule],
    with_row_count: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach incremental quality monitoring to a stream.

    Rule restriction (a deliberate divergence from batch ``validate``):
    duplicate (kind, column) rules raise ValueError AT ATTACH — the
    cumulative report keys violations by (rule, column) and same-kind
    rules on one column would silently merge into one summed row
    (round-8 generative find). A monitor configured with e.g. two
    ``in_range`` bounds on a column must combine them into one
    ``in_range(lo=, hi=)`` rule or run two monitors; ``unique`` rules
    are refused outright (not sum-decomposable across micro-batches).
    """
    _check_rules(rules)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: process_batch(df, bid, state_dir, rules, with_row_count)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_quality_batchlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """registry.streaming_quality_report body: drain the events fixture
    through the monitor (fresh state per call) and return the
    cumulative report. Sum-decomposability makes the stream-maintained
    report equal the one-shot batch validate, so this streaming
    operator carries a FULL value oracle."""
    import tempfile
    import uuid

    from lime_etl_spark.ops.util import cleanup_dir_at_exit
    from lime_etl_spark.streaming.events import read_events_stream, stage_events_dir

    work = tempfile.mkdtemp(prefix=f"lime_quality_{uuid.uuid4().hex[:8]}_")
    cleanup_dir_at_exit(work)
    state = os.path.join(work, "state")
    q = monitor_quality(
        read_events_stream(spark, stage_events_dir(sf_dir)),
        state,
        os.path.join(work, "ck"),
        rules=_FIXTURE_RULES,
    )
    q.awaitTermination()
    return report(spark, state)


# Rules the gated query pins (mirrored literally in the DuckDB oracle).
_FIXTURE_RULES = (
    quality.not_null("user_id"),
    quality.not_null("ts"),
    quality.accepted_values(
        "event_type", ("click", "error", "purchase", "signup", "view")
    ),
    quality.in_range("value", lo=0.0, hi=1_000_000.0),
)
