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


def duck_connect(sf_dir: str):
    import os

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # generated rehearsal fixtures (tools.datagen) write each table
        # as a DIRECTORY of part files; the driver fixture is one file
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def check_seed(spark, duck, seed: int, sf_dir: str) -> dict:
    """Run one seed both ways. Returns a result record (never raises on
    comparison failure; build/execute errors are captured too)."""
    from lime_etl_spark.tools.qgen import generate_query

    rec: dict = {"seed": seed}
    try:
        rel = generate_query(seed, spark, sf_dir)
    except Exception as exc:  # generator bug — report, don't kill the sweep
        rec["error"] = f"generate: {type(exc).__name__}: {exc}"
        return rec
    rec["ops"] = rel.ops
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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=2000)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from lime_etl_spark.session import get_spark

    spark = get_spark("gencheck", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
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
