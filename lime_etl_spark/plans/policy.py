"""Broadcast-hint policy: hint only what is bounded by CONTRACT.

An explicit ``F.broadcast()`` hint bypasses *both* of Spark's size
checks — the static ``spark.sql.autoBroadcastJoinThreshold`` estimate at
planning time and AQE's runtime re-plan from measured shuffle stats. A
hinted relation is shipped to every executor and pinned on the driver
no matter how large it turns out to be, so a hint is only safe on
relations whose size is bounded by *contract*, not by the current scale
factor:

- **Fixed-size dimensions** (``schemas.BROADCAST_TABLES``): TPC-H
  ``region`` (5 rows) and ``nation`` (25 rows) have the same
  cardinality at every SF. Broadcasting them is always right, and the
  hint saves AQE a needless first-stage measurement.
- **Contract-bounded frames** (``bounded=True``): probe sets sized by a
  function argument, top-k seeds, 1-row global stats — anything whose
  row count is fixed by the API, not by the data volume.

Everything else is returned *unhinted*. At fixture SFs Spark broadcasts
it anyway — the parquet footer gives the static planner an accurate
size estimate below the 10 MB default threshold, and AQE re-checks at
runtime — while at a 100 TB-scale SF (supplier/part in the 1e8–1e9-row
range, multi-GB per copy) the same query degrades gracefully to a
shuffle join instead of OOMing the driver and every executor.

This module exists because round-6's review fixed the policy in prose
(q5's docstring) while the code kept the hints; routing every registry
hint through ``auto_broadcast`` makes the policy greppable and makes
"hint on an SF-growing table" impossible to write by accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lime_etl_spark import schemas


def auto_broadcast(
    df: DataFrame, table: str | None = None, bounded: bool = False
) -> DataFrame:
    """Return ``df`` with a broadcast hint iff the policy allows one.

    Parameters
    ----------
    df:
        The join side under consideration (possibly already filtered /
        projected — the policy keys on provenance, not current size).
    table:
        The source table name the frame derives from. Hinted iff it is
        in ``schemas.BROADCAST_TABLES`` (fixed cardinality at every SF).
        A *filtered* supplier/part is still unhinted: its size scales
        with SF even when a predicate keeps a constant fraction.
    bounded:
        Caller's declaration that the frame's row count is bounded by
        an API contract (probe set, k-row init, 1-row stats) rather
        than by data volume. Callers must state the bound in a comment
        at the call site.
    """
    if bounded or (table is not None and table in schemas.BROADCAST_TABLES):
        return F.broadcast(df)
    return df
