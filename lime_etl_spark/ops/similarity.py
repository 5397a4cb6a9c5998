"""Embedding similarity search over ``embeddings`` (north-star set).

Brute-force cosine top-k is the exact baseline (oracle-checked against
DuckDB); LSH random-hyperplane bucketing is the approximate scale path.

All vector math runs JVM-side via higher-order array functions
(zip_with / aggregate) after casting float→double element-wise, so the
arithmetic is exact double ops in a deterministic sequential order —
which is what lets the DuckDB oracle reproduce scores bit-for-bit
(modulo a pinned rounding to 6 decimals before ranking).

Scale posture:
- the query side is expected to be small (a probe set) → broadcast it;
  candidates stream through a single narrow pass + per-query top-k
  (TakeOrdered-style window). Never materialize the full score matrix.
- beyond ~10^7 candidates use lsh_bucketed_topk: hyperplane signatures
  bucket the corpus (groupBy, ~linear), probes search only their bucket
  (and optionally neighboring buckets via multi-probe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.round(_norm(_to_double(F.col(vec_col))), 6))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, rank, score).

    Self-matches (same id) are excluded. Ranking orders by rounded score
    desc then neighbor id asc — a total order both engines agree on.
    The query side is broadcast: the big side streams exactly once.
    """
    from lime_etl_spark.ops.util import ensure_parallelism

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
        )
    )
    # per-pair dot products are the CPU-heavy step → spread candidates
    c = ensure_parallelism(
        candidates.select(
            F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
        )
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — approximate scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy RNG state,
    reproducible across sessions/partitions)."""
    planes, state = [], 123456789
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / float(2**31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Sign-of-projection hyperplane signature → integer bucket id.

    n_planes=8 → 256 buckets; tune so buckets hold ~candidates/256 rows.
    Pure column expressions: the planes are literal arrays folded into
    the plan (constant-folded, broadcast implicitly with the plan).
    """
    planes = _hyperplanes(dim, n_planes)
    v = _to_double(F.col(vec_col))
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        proj = _dot(v, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0))
    return df.withColumn(out, bucket)


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    multi_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the probe's LSH
    bucket(s). Join on bucket replaces the cross join — candidate set
    per probe shrinks ~2^n_planes-fold.

    multi_probe=1 additionally probes every flip-one-bit neighbor bucket
    (n_planes+1 buckets total): the nearest misses in hyperplane LSH are
    vectors just across ONE hyperplane, so one-bit probing recovers most
    of the recall loss for a (n_planes+1)/2^n_planes coverage cost.
    Tune n_planes so corpus/2^n_planes ≈ the per-bucket candidate budget
    (8 planes → /256; small corpora want 4-5 planes).
    """
    qb0 = with_lsh_bucket(queries, dim, n_planes, vec_col).select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
        F.col("bucket"),
    )
    if multi_probe >= 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(2**i).cast("bigint"))
                for i in range(n_planes)
            ],
        )
        qb = qb0.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    else:
        qb = qb0
    cb = with_lsh_bucket(candidates, dim, n_planes, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        F.col("bucket"),
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
