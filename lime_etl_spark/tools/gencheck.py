"""Generative differential-test runner: qgen pipelines vs DuckDB.

For each seed, build the generated pipeline's Spark DataFrame (through
the engine's operator surface) and its SQL twin, run both over the same
parquet, and compare row count, column names, and order-insensitive
canonical values — the same bar as tests/test_oracle.py, extended with
exact Decimal handling (generated aggregates keep DECIMAL outputs
rather than casting to double, so the compare is bit-exact, not
tolerance-based).

Artifact runner:

    python -m lime_etl_spark.tools.gencheck --seeds 2000 \
        --sf-dir /root/testdata/sf0.001 --out GENCHECK_r07.json
"""

from __future__ import annotations

import argparse
import json
import math
import time
from collections import Counter
from decimal import Decimal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value):
    """Canonicalize one cell for exact order-insensitive comparison."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return value.hex()
    if isinstance(value, Decimal):
        # scale differs across engines (Spark sum(dec(18,6)) -> dec(28,6),
        # DuckDB -> dec(38,6)); the VALUE is what must match
        return f"dec:{value.normalize()}"
    if isinstance(value, bytes):
        return value.hex()
    return value


def rowset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    """Returns a list of mismatch descriptions; empty = match."""
    errs: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        errs.append(f"columns: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return errs
    if len(spark_rows) != len(duck_rows):
        errs.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        return errs
    s, d = rowset(spark_rows, spark_cols), rowset(duck_rows, duck_cols)
    bad = [(a, b) for a, b in zip(s, d) if a != b]
    if bad:
        errs.append(f"values: first diffs {bad[:3]}")
    return errs


# ---------------------------------------------------------------------------
# Collect-free compare (round-10, r9 verdict task #2): per-partition
# hash fold on the Spark side, streaming Arrow-reader fold on the
# DuckDB side — the driver's own hash_match design applied to the
# generative sweep, so sf10+ whole-result checks never materialize
# either engine's full result in driver memory.
# ---------------------------------------------------------------------------

_HASH_MOD = 1 << 64


def _canon_cell(v):
    """canon() extended to the types the Arrow path surfaces (tz-aware
    timestamps, dates, nested lists/structs), rendered deterministic.
    Both engines run THIS function over their own Arrow output, so the
    only shared code is the canonicalization — exactly like the
    collect-based compare's canon()."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        # Spark's Arrow batches carry the session timezone (UTC);
        # DuckDB's timestamps are naive (UTC by the session contract) —
        # normalize both to naive-UTC ISO text
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return "ts:" + v.isoformat()
    if isinstance(v, dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, bool):
        return v  # before int: bool is an int subclass
    if isinstance(v, (int, Decimal)):
        # one rendering for ALL exact numerics: DuckDB's Arrow reader
        # surfaces HUGEINT (sum(bigint)) as decimal128(38,0) where
        # fetchall() coerces it to python int — Spark's stays int64.
        # The full compare never sees this (fetchall's coercion hides
        # it); the Arrow path must unify int and integral Decimal or
        # every sum(bigint) aggregate false-mismatches. format(...,'f')
        # avoids normalize()'s exponent form (1.69244E+5) and strips
        # trailing zeros via normalize() first, so dec(38,2) '7.50',
        # dec(12,1) '7.5' and int 7.5x10 all land on the same text.
        if isinstance(v, Decimal):
            return "num:" + format(v.normalize(), "f")
        return "num:" + str(v)
    if isinstance(v, list):
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(f"{k}={_canon_cell(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    return canon(v)


def _fold_record_batches(batches, cols_sorted):
    """Order-insensitive ``(count, sum-of-row-hashes mod 2^64)`` fold
    over an iterable of pyarrow RecordBatches — one batch resident at a
    time. Row hash = sha1 over the repr of the name-sorted canonical
    cell tuple (the same cell canonicalization the full compare uses)."""
    import hashlib

    cnt, acc = 0, 0
    for rb in batches:
        if rb.num_rows == 0:
            continue
        idx = [rb.schema.get_field_index(c) for c in cols_sorted]
        cols = [rb.column(i).to_pylist() for i in idx]
        for row in zip(*cols):
            s = repr(tuple(_canon_cell(v) for v in row)).encode()
            acc = (
                acc + int.from_bytes(hashlib.sha1(s).digest()[:8], "big")
            ) % _HASH_MOD
            cnt += 1
    return cnt, acc


def _spark_hash_fold(sdf):
    """Distributed fold: per-partition (count, hash-sum) partials via
    mapInArrow; ONE tiny row per partition reaches the driver. The sum
    is commutative, so partition order (and any shuffle nondeterminism)
    cannot affect the aggregate."""
    cols_sorted = sorted(sdf.columns)

    def fold(batches):
        import pyarrow as pa

        cnt, acc = _fold_record_batches(batches, cols_sorted)
        # acc as text: 2^64-1 overflows Arrow's int64
        yield pa.RecordBatch.from_pydict({"cnt": [cnt], "acc": [str(acc)]})

    parts = sdf.mapInArrow(fold, "cnt bigint, acc string").collect()
    cnt = sum(r.cnt for r in parts)
    acc = sum(int(r.acc) for r in parts) % _HASH_MOD
    return cnt, acc, list(sdf.columns)


def _duck_hash_fold(drel, batch_size: int = 65536):
    """Streaming fold over DuckDB's Arrow record-batch reader —
    constant memory, never a full fetchall."""
    cols = list(drel.columns)
    reader = drel.fetch_arrow_reader(batch_size)

    def gen():
        while True:
            try:
                yield reader.read_next_batch()
            except StopIteration:
                return

    cnt, acc = _fold_record_batches(gen(), sorted(cols))
    return cnt, acc, cols


def duck_connect(sf_dir: str):
    import os

    import duckdb

    con = duckdb.connect()
    # bound the oracle: generated queries can draw self-outer joins
    # whose intermediates are ~rows^2 on a hot key — at sf10 one such
    # oracle ballooned to 49 GB RSS and the kernel OOM-killed the whole
    # sweep. A memory cap makes DuckDB spill to disk instead; paired
    # with the per-seed wall budget, a pathological draw costs bounded
    # time and memory, never the sweep.
    con.sql("SET memory_limit='16GB'")
    con.sql("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # generated rehearsal fixtures (tools.datagen) write each table
        # as a DIRECTORY of part files; the driver fixture is one file
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def check_seed(
    spark, duck, seed: int, sf_dir: str, compare_mode: str = "full"
) -> dict:
    """Run one seed both ways. Returns a result record (never raises on
    comparison failure; build/execute errors are captured too).

    ``compare_mode='hash'`` swaps the full-result collect for the
    collect-free fold above — same columns/rowcount/value bar, with the
    value check as an order-insensitive row-hash sum instead of a
    sorted row-by-row diff (so a mismatch reports no sample rows)."""
    from lime_etl_spark.tools.qgen import generate_query

    rec: dict = {"seed": seed}
    try:
        rel = generate_query(seed, spark, sf_dir)
    except Exception as exc:  # generator bug — report, don't kill the sweep
        rec["error"] = f"generate: {type(exc).__name__}: {exc}"
        return rec
    rec["ops"] = rel.ops
    if compare_mode == "hash":
        return _check_seed_hash(rec, rel, duck)
    try:
        sdf = rel.df
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = sdf.columns
    except Exception as exc:
        rec["error"] = f"spark: {type(exc).__name__}: {exc}"
        rec["sql"] = rel.sql
        return rec
    try:
        drel = duck.sql(rel.sql)
        duck_rows = drel.fetchall()
        duck_cols = list(drel.columns)
    except Exception as exc:
        rec["error"] = f"duckdb: {type(exc).__name__}: {exc}"
        rec["sql"] = rel.sql
        return rec
    errs = compare(spark_rows, spark_cols, duck_rows, duck_cols)
    if errs:
        rec["mismatch"] = errs
        rec["sql"] = rel.sql
    else:
        rec["rows"] = len(spark_rows)
    return rec


def _check_seed_hash(rec: dict, rel, duck) -> dict:
    try:
        s_cnt, s_acc, spark_cols = _spark_hash_fold(rel.df)
    except Exception as exc:
        rec["error"] = f"spark: {type(exc).__name__}: {exc}"
        rec["sql"] = rel.sql
        return rec
    try:
        d_cnt, d_acc, duck_cols = _duck_hash_fold(duck.sql(rel.sql))
    except Exception as exc:
        rec["error"] = f"duckdb: {type(exc).__name__}: {exc}"
        rec["sql"] = rel.sql
        return rec
    errs: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        errs.append(f"columns: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    elif s_cnt != d_cnt:
        errs.append(f"rowcount: spark={s_cnt} duck={d_cnt}")
    elif s_acc != d_acc:
        errs.append(f"valuehash: spark={s_acc} duck={d_acc} over {s_cnt} rows")
    if errs:
        rec["mismatch"] = errs
        rec["sql"] = rel.sql
    else:
        rec["rows"] = s_cnt
    return rec


def run_sweep(spark, sf_dir: str, seeds, progress_every: int = 200) -> dict:
    duck = duck_connect(sf_dir)
    t0 = time.time()
    results, failures = [], []
    op_hist: Counter = Counter()
    rows_total = 0
    for i, seed in enumerate(seeds):
        rec = check_seed(spark, duck, seed, sf_dir)
        if "error" in rec or "mismatch" in rec:
            failures.append(rec)
        else:
            rows_total += rec["rows"]
        for op in rec.get("ops", []):
            op_hist[op.split(":")[0]] += 1
        results.append(rec)
        if progress_every and (i + 1) % progress_every == 0:
            print(
                f"# {i + 1}/{len(seeds)} seeds, {len(failures)} failures, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )
    duck.close()
    return {
        "sf_dir": sf_dir,
        "seeds_run": len(results),
        "seed_min": min(seeds) if len(seeds) else None,
        "seed_max": max(seeds) if len(seeds) else None,
        "failures": failures,
        "failure_count": len(failures),
        "rows_compared_total": rows_total,
        "op_histogram": dict(sorted(op_hist.items())),
        "elapsed_sec": round(time.time() - t0, 1),
    }


# The full op-label vocabulary qgen can emit (extracted from the
# 3,000-seed round-8 sf0.1 artifact, which saturates the draw space) —
# the --min-op target set, so a "run until every family is covered"
# sweep cannot be satisfied vacuously by never drawing a rare op.
QGEN_OPS = [
    "asof", "base", "cube", "dense_rank", "derive", "distinct", "dropna",
    "except_all", "except_distinct", "filter", "first_last", "group",
    "having", "inner", "intersect", "keep_latest", "lag_lead", "left",
    "left_anti", "left_semi", "moving", "ntile", "part_sum", "project",
    "rank", "rename", "rollup", "row_number", "running", "salted",
    "self_outer", "sort_limit", "topk", "union_all", "union_distinct",
]


def run_sweep_min_ops(
    spark, sf_dir: str, start: int, min_seeds: int, min_per_op: int,
    cap: int = 50000, progress_every: int = 50, seed_timeout: float = 180.0,
    compare_mode: str = "full",
) -> dict:
    """Round-9 (r8 verdict task #3): run ``min_seeds`` random seeds,
    then TARGET the ops still under the ``min_per_op`` floor — the r8
    sf1 block left asof/except_distinct at 1 draw each, and the rarest
    op (asof, ~0.009/seed) would need ~1,100 random seeds at ~17 s/seed
    to reach 10. Targeting is seed SELECTION, not test weakening: the
    plan-only generator (no jobs) is scanned for seeds whose drawn
    pipeline contains an under-floor op, and those seeds run through
    the identical differential check; the artifact lists the targeted
    seeds separately so the two phases stay distinguishable."""
    duck = duck_connect(sf_dir)
    t0 = time.time()
    results, failures = [], []
    timeouts: list[int] = []
    targeted_seeds: list[int] = []
    op_hist: Counter = Counter()
    rows_total = 0
    seed = start
    phase = "random"
    queue: list[int] = []
    scan_seed = start + 1_000_000  # disjoint from the random block
    while seed < start + cap or queue:
        # Per-seed wall budget: a drawn pipeline's DuckDB oracle can
        # explode at sf>=1 (e.g. a self-outer join whose intermediate is
        # ~rows^2 on a hot key) — one such seed otherwise wedges the
        # whole sweep for hours at tens of GB. Timed-out seeds are NOT
        # silently dropped: they're listed in the artifact and excluded
        # from the op floor, so coverage claims stay honest. This is a
        # compute bound, not a correctness filter — the same seed passes
        # at smaller SF (both engines, same data, same plan).
        if phase == "random":
            this_seed = seed
            seed += 1
            if seed - start >= min_seeds:
                phase = "targeted"
        else:
            under = [t for t in QGEN_OPS if op_hist.get(t, 0) < min_per_op]
            if not under:
                break
            while not queue:
                # plan-only scan (builds the pipeline, runs NO jobs)
                from lime_etl_spark.tools.qgen import generate_query

                rel = generate_query(scan_seed, spark, sf_dir)
                if any(o.split(":")[0] in under for o in rel.ops):
                    queue.append(scan_seed)
                scan_seed += 1
                if scan_seed > start + 1_000_000 + 100_000:
                    print("# targeting scan cap hit", flush=True)
                    queue.append(None)
            this_seed = queue.pop(0)
            if this_seed is None:
                break
            targeted_seeds.append(this_seed)

        box: dict = {}

        def _one(s=this_seed, d=duck):
            box["rec"] = check_seed(spark, d, s, sf_dir, compare_mode)

        import threading

        th = threading.Thread(target=_one, daemon=True)
        th.start()
        th.join(timeout=seed_timeout)
        if th.is_alive():
            try:
                duck.interrupt()
            except Exception:
                pass
            spark.sparkContext.cancelAllJobs()
            th.join(timeout=60)
            timeouts.append(this_seed)
            print(f"# seed {this_seed}: exceeded {seed_timeout}s budget, skipped", flush=True)
            # close the old connection ONLY once the worker thread is
            # confirmed dead: interrupt() is best-effort and the join
            # can expire with the query still running — DuckDB
            # connections are not safe to close during concurrent use
            # (close-while-querying can crash the whole sweep). If the
            # zombie survives the join, LEAK the connection to it and
            # just open a fresh one.
            if not th.is_alive():
                duck.close()
            duck = duck_connect(sf_dir)  # a fresh connection; the old one may be poisoned
            continue
        rec = box["rec"]
        if "error" in rec or "mismatch" in rec:
            failures.append(rec)
        else:
            rows_total += rec["rows"]
        for op in rec.get("ops", []):
            op_hist[op.split(":")[0]] += 1
        results.append(rec)
        if progress_every and len(results) % progress_every == 0:
            short = min(op_hist.get(t, 0) for t in QGEN_OPS)
            print(
                f"# {len(results)} seeds ({phase}), {len(failures)} failures, "
                f"min-op={short}, {time.time() - t0:.0f}s",
                flush=True,
            )
        if phase == "targeted" and all(
            op_hist.get(t, 0) >= min_per_op for t in QGEN_OPS
        ):
            break
    duck.close()
    return {
        "sf_dir": sf_dir,
        "compare_mode": compare_mode,
        "min_per_op": min_per_op,
        "seed_timeout_sec": seed_timeout,
        "timed_out_seeds": timeouts,
        "targeted_seeds": targeted_seeds,
        "ops_floor_met": all(op_hist.get(t, 0) >= min_per_op for t in QGEN_OPS),
        "seeds_run": len(results),
        "seed_min": start,
        "seed_max": seed - 1,
        "failures": failures,
        "failure_count": len(failures),
        "rows_compared_total": rows_total,
        "op_histogram": dict(sorted(op_hist.items())),
        "elapsed_sec": round(time.time() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=2000)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--min-op", type=int, default=None,
        help="run at least --seeds seeds and until every qgen op label "
        "has this many draws",
    )
    ap.add_argument(
        "--compare-mode", choices=["full", "hash"], default="full",
        help="full: collect both engines' results and diff row-by-row; "
        "hash: collect-free order-insensitive row-hash fold (sf10+)",
    )
    ap.add_argument(
        "--seed-timeout", type=float, default=180.0,
        help="per-seed wall budget (min-op mode only)",
    )
    args = ap.parse_args()

    from lime_etl_spark.session import get_spark

    spark = get_spark("gencheck", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.min_op:
        report = run_sweep_min_ops(
            spark, args.sf_dir, args.start, args.seeds, args.min_op,
            seed_timeout=args.seed_timeout, compare_mode=args.compare_mode,
        )
    else:
        report = run_sweep(
            spark, args.sf_dir, range(args.start, args.start + args.seeds)
        )
    line = json.dumps(
        {k: v for k, v in report.items() if k != "failures"}
        | {"failure_count": report["failure_count"]}
    )
    print(line)
    if report["failures"]:
        for f in report["failures"][:10]:
            print(json.dumps(f))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
