"""Table profiling — the data-quality surface a warehouse loader needs
before trusting an extract (the reference's only "validation" was
crashing on KeyError mid-pipeline).

``profile_table`` computes per-column null counts, exact distinct
counts, and min/max in ONE aggregation pass (a single scan — each
metric is one aggregate expression, not one job per column), emitted
long-format ``(column, n_nulls, n_distinct, min_str, max_str)`` so the
schema is uniform across column types. At 100 TB swap exact distinct
for approx_count_distinct (same shape, bounded memory) via
``approximate=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approximate else F.countDistinct
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
                distinct(c).alias(f"__nd_{c}"),
                F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
            ]
        )
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_str"),
                        F.col(f"__mx_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.column", "p.n_nulls", "p.n_distinct", "p.min_str", "p.max_str")
