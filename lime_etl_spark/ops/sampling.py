"""Deterministic splitting and sampling (training-data preparation).

randomSplit/sample are nondeterministic across runs and cluster
layouts — useless for reproducible train/eval splits. These operators
derive membership from a portable content hash (md5-prefix as integer,
the same construction ops/dedup.py uses), so:

- the split is a pure function of the row key: stable across runs,
  engines, partitionings, and cluster sizes;
- rows added to the corpus later don't reshuffle existing assignments;
- the DuckDB oracle reproduces assignments bit-for-bit (no RNG state
  to share).

Both are narrow (no shuffle): hash + modulo per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lime_etl_spark.plans import auto_broadcast


def _key_hash(key_col: str, salt: str = "") -> Column:
    """Portable 60-bit content hash of (key, salt): first 15 md5 hex
    digits as int64 (non-negative). The ONE construction every
    deterministic-membership operator in this module derives from —
    editing the expression here is the only way to change it, so the
    split/sample/pack family can never silently disagree on what
    "hash of the key" means (they did share it only by copy-paste
    before a round-6 review).

    NULL keys hash as '' — assigned deterministically like any other
    value, never silently dropped (the old concat(NULL, salt) made the
    whole hash NULL, so with_split piled every NULL-key row into
    'eval' while deterministic_sample dropped the same rows entirely).
    A NULL key therefore collides with the empty-string key; callers
    that must distinguish them should filter or repair NULLs upstream.
    Matches DuckDB ('0x'||substr(md5(coalesce(k::VARCHAR,'')||salt),
    1,15))::BIGINT.
    """
    keyed = F.concat(
        F.coalesce(F.col(key_col).cast("string"), F.lit("")), F.lit(salt)
    )
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("bigint")


def _bucket(key_col: str, salt: str = "", buckets: int = 100) -> Column:
    """Hash bucket in [0, buckets) over _key_hash."""
    return _key_hash(key_col, salt) % F.lit(buckets)


def with_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 90,
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign train/eval by hash bucket: bucket < train_pct -> train.

    ``salt`` derives independent splits from the same keys (e.g. one
    per experiment) — concatenated into the hashed value, not a second
    column, so the oracle twin stays a single expression. NULL keys
    are assigned like the empty-string key (see _key_hash), not routed
    wholesale into one split."""
    b = _bucket(key_col, salt)
    return df.withColumn(
        out, F.when(b < train_pct, F.lit("train")).otherwise(F.lit("eval"))
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Deterministic ~pct% sample: hash(key + salt) bucket < pct. The
    hash is uniform, so any stratum (label, language, source) thins by
    the same factor without per-stratum state — stratification for
    free, reproducible across runs and engines. NULL keys participate
    (hashed as '', see _key_hash) instead of being silently dropped by
    a NULL comparison."""
    return df.filter(_bucket(key_col, salt) < pct)


def stratified_sample_exact(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen deterministically: rank rows inside each
    stratum by (content hash, key) and keep the first n.

    The hash makes the pick uniform and reproducible; the key tiebreak
    makes it total. Unlike rate-based thinning (weighted_resample), the
    per-stratum count is EXACT — the contract eval-set construction
    needs. One shuffle (the per-stratum window); rank order is
    hash-random, so the kept set is unbiased within each stratum.
    """
    from pyspark.sql import Window

    h = _key_hash(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__h", "__rn")
    )


def weighted_resample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[object, int],
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum resampling: keep a row iff its hash
    bucket falls under its stratum's target percentage.

    The standard knob for rebalancing a training mix (down-weight a
    dominant domain/language/label, keep a rare one at 100%): rates map
    stratum value -> keep percentage in [0, 100]; strata absent from
    the map keep ``default_pct``. Membership is the same portable
    content-hash bucket as deterministic_sample, so the resample is a
    pure row function — reproducible across runs, engines, and corpus
    growth, with no RNG state and no per-stratum bookkeeping.

    Narrow (no shuffle): one hash + one CASE per row. The rate table
    rides inline as a literal CASE chain (sorted for determinism), not
    a join — rebalancing maps are dozens of entries, never data-sized.
    """
    b = _bucket(key_col, salt)
    rate: Column = F.lit(default_pct)
    for value, pct in sorted(rates.items(), key=lambda kv: str(kv[0])):
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)


def global_shuffle_rank(
    df: DataFrame,
    key_col: str,
    seed: str = "42",
    partitions: int | None = None,
    out: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global shuffle order for training: every row gets a
    dense 1-based rank in ascending order of a portable content hash
    (md5 of key + seed, tie-broken by key). Epoch ordering for a corpus
    needs exactly this — shuffled once, reproducibly, identically on
    any cluster layout; a different ``seed`` gives an independent order.

    Scale shape: the naive ``row_number() OVER (ORDER BY hash)`` plans a
    window with NO partition spec — Spark funnels the whole corpus
    through one task. Two-phase instead:

    1. range-repartition + sort within partitions on (hash, key): the
       distributed sort a shuffle-write performs anyway, so partitions
       are globally ordered ranges;
    2. per-partition row counts (one row per partition — scalar-sized,
       the only driver traffic) prefix-summed into offsets, joined back
       as a broadcast literal table; rank = offset + local row_number,
       where the local window partitions by ``spark_partition_id()`` —
       ~|corpus|/P rows each, never one global partition.

    ``localCheckpoint`` pins partition identity between the count pass
    and the rank pass: range boundaries come from a per-execution
    sample job, so two independent recomputes of the sorted plan could
    legally disagree on which row lands in which partition. At 100 TB
    the equivalent is writing the sorted corpus and ranking from file
    position; the checkpoint is the in-session stand-in and costs what
    that shuffle-write would.
    """
    # coalesce, not concat_ws NULL-skipping: concat_ws made every
    # NULL-key row hash to md5(seed) with a NULL tiebreak — equal sort
    # keys, so their ranks were nondeterministic (and diverged from the
    # oracle's NULL-propagating ||). NULL hashes as '' like _key_hash.
    h = F.md5(
        F.concat(
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
            F.lit(f"-{seed}"),
        )
    )
    return _two_phase_rank(
        df.withColumn("__h", h), ["__h", key_col], out, partitions
    ).drop("__h")


def global_rank(
    df: DataFrame,
    order_cols: "list[str]",
    out: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global rank in ``order_cols`` order, computed the
    distributed two-phase way (see global_shuffle_rank's scale notes —
    same machinery, arbitrary sort columns). ``order_cols`` must
    totally order rows (append a unique key as tiebreak) or ranks are
    nondeterministic. Ranking a column by ITSELF is the empirical-CDF
    transform — the skew-robust encoding for zorder_bucket: buckets of
    ranks are equi-populated whatever the value distribution.
    """
    return _two_phase_rank(df, order_cols, out, partitions)


def _two_phase_rank(
    df: DataFrame,
    order_cols: "list[str]",
    out: str,
    partitions: int | None,
) -> DataFrame:
    nparts = partitions or df.sparkSession.sparkContext.defaultParallelism
    srt = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = srt.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__n"]
    # bounded by contract: one row per partition (nparts rows)
    off_df = auto_broadcast(
        df.sparkSession.createDataFrame(offsets, "__pid int, __off bigint"),
        bounded=True,
    )
    from pyspark.sql import Window

    wlocal = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        srt.join(off_df, "__pid")
        .withColumn(
            out,
            (F.col("__off") + F.row_number().over(wlocal)).cast("bigint"),
        )
        .drop("__pid", "__off")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str = "doc_id",
    length_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed
    token-budget bins for training-batch assembly.

    A true first-fit packer is inherently sequential; the distributed,
    reproducible formulation used here is HASH-BUCKETED GREEDY FILL:

    1. route each doc to one of ``n_buckets`` streams by content hash
       (same portable construction as with_split — stable, uniform);
    2. inside a bucket, order docs deterministically (hash, then key as
       tiebreak) and take the running token total;
    3. bin index = (cumulative - length) div budget — i.e. a new bin
       starts whenever the running total crosses a budget boundary.

    Scale shape: the only wide operation is a window partitioned BY
    BUCKET — n_buckets parallel cumsums, each over corpus/n_buckets
    docs — never a global single-partition ordering. Bin ids are
    (bucket, local_bin) pairs flattened as bucket * 2^32 + local_bin,
    collision-free and stable as the corpus grows per bucket.

    Bin-size contract: a bin holds every doc whose PRECEDING running
    total sits in the same budget window, so a bin can overshoot the
    budget by at most its last doc's length (next-fit semantics — the
    standard streaming approximation; exact first-fit is sequential).
    Oversized docs therefore inflate their bin: chunk them first
    (text chunking) when a hard cap matters.

    Rows with a NULL ``length_col`` are EXCLUDED from packing: an
    unknown token count can neither advance the running total nor be
    budgeted, and the old behavior (NULL cumsum diff ⇒ NULL bin)
    silently funneled every such doc corpus-wide into one meaningless
    NULL bin that pack_materialize then shipped to the trainer as a
    single unbounded training row. Count NULL lengths upstream
    (quality.not_null) if they must be zero.
    """
    from pyspark.sql import Window

    df = df.filter(F.col(length_col).isNotNull())
    w = Window.partitionBy("pack_bucket").orderBy("__h", key_col)
    out = (
        df.withColumn("__h", _key_hash(key_col, salt))
        .withColumn("pack_bucket", (F.col("__h") % F.lit(n_buckets)).cast("bigint"))
        .withColumn("__cum", F.sum(length_col).over(w))
        .withColumn(
            "local_bin",
            F.floor((F.col("__cum") - F.col(length_col)) / F.lit(budget)).cast(
                "bigint"
            ),
        )
    )
    return (
        out.withColumn(
            "pack_bin",
            (F.col("pack_bucket") * F.lit(1 << 32) + F.col("local_bin")).cast(
                "bigint"
            ),
        )
        .drop("__h", "__cum")
    )


def pack_materialize(
    packed: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    length_col: str = "n_tokens",
    sep: str = "\n\n",
    salt: str = "",
) -> DataFrame:
    """Materialize pack_sequences bins into training rows: one row per
    bin with the member documents concatenated in the bin's
    deterministic fill order (hash, then key — the same order the
    packer assigned cumulative totals in; pass the packer's ``salt``),
    plus member count and total length.

    This is the step that turns a bin ASSIGNMENT into the artifact a
    trainer reads. One shuffle on pack_bin; the per-bin collect_list is
    bounded by the token budget (a bin holds at most budget/min_doc_len
    docs), so reassembly memory is capped by construction — unlike
    per-doc grouping, bins cannot be pathologically large.
    """
    order_h = _key_hash(key_col, salt)
    member = F.struct(
        order_h.alias("h"),
        F.col(key_col).alias("k"),
        F.col(text_col).alias("t"),
        F.col(length_col).alias("n"),
    )
    return (
        packed.select("pack_bin", member.alias("__m"))
        .groupBy("pack_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__m.n")).cast("bigint").alias("total_tokens"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list("__m")), lambda s: s["t"]
                ),
            ).alias("packed_text"),
        )
    )
