"""lime_etl_spark — a PySpark-native analytics & ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL (pedrocarvalhodev/lime_etl: LimeSurvey JSON-RPC extract →
flatten → relational clean → S3/warehouse load), widened into a full
analytics engine: joins/aggregations/windows/set-ops, text analysis,
exact & near-duplicate detection, embedding similarity search,
multimodal column plumbing, Structured Streaming over event logs
(including incremental LSH dedup and MERGE-free SCD2 maintenance),
behavioral analytics (cohorts, ordered funnels, point-in-time joins),
integer-exact graph centrality, and declarative data-quality
constraints.

Design stance (SURVEY.md §7): lazy DataFrames end-to-end, declarative
plans that Catalyst can optimize (pushdown, pruning, broadcast), no
driver-side row loops, deterministic outputs (pinned run timestamps,
explicit dedup tiebreaks), and every operator designed for a
1000-executor / 100 TB deployment even though tests run on local[32].
"""

__version__ = "0.1.0"

from lime_etl_spark.session import get_spark  # noqa: F401
