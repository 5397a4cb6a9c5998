"""Scale rehearsal: observe headline-query scaling above the fixture SF.

The driver's fixtures stop at sf0.1 (~600k lineitem rows); every claim
about 100 TB behavior needs at least one *observation* above that. This
tool times the registry's headline queries at several scale factors —
the read-only driver fixture for sf<=0.1, `tools.datagen` output for
larger SFs (generated on demand under --workdir) — and reports, per
query, the wall-time ratio between consecutive SFs next to the data
ratio. A query whose time ratio tracks ~the data ratio (x log factor
for sort/shuffle paths) scales; one whose ratio blows past it has a
superlinear stage that 1000 executors will not save.

Methodology matches bench.py: noop sink (full computation, no write or
collect), min of N warm fresh-plan runs per query, all SFs in one JVM
(heap state carries over — min-of-N absorbs GC spikes; run SFs in
increasing order so the big SF never poisons the small one's numbers).

CLI::

    python -m lime_etl_spark.tools.scale_rehearsal --sfs 0.1 1 --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def _sf_dir(sf: float, workdir: str) -> str:
    # driver fixture for the SFs it ships; generated data beyond
    label = f"sf{sf:g}"
    fixture = f"/root/testdata/{label}"
    return fixture if os.path.isdir(fixture) else os.path.join(workdir, label)


def _ensure_generated(spark, sf: float, workdir: str) -> str:
    """Resolve (and if needed, generate) the dataset dir for ``sf``.

    Driver-shipped fixtures are used as-is. GENERATED dirs carry a
    completion marker, not a bare isdir probe: a generation killed
    mid-write leaves a partial directory that a rerun would silently
    time queries against (missing tables crash; a mid-table kill
    corrupts the published ratios with no signal). No marker ⇒ the
    directory is wiped and regenerated.
    """
    from lime_etl_spark.tools import datagen

    sdir = _sf_dir(sf, workdir)
    if sdir.startswith("/root/testdata"):
        return sdir
    marker = os.path.join(sdir, "_GENERATED")
    if not os.path.exists(marker):
        if os.path.isdir(sdir):
            # Never rmtree a directory we can't positively identify as
            # this tool's output: a pre-marker-era dataset, or a user
            # directory that merely shares the sfN name, must not be
            # destroyed on a bare isdir probe. Identify-then-act:
            #   - all entries look like datagen output (<table>.parquet
            #     dirs from the known table list, plus marker/underscore
            #     files) — otherwise refuse with an explicit error;
            #   - if every expected table is present and complete-ish,
            #     adopt it: write the marker instead of regenerating
            #     (legacy dirs from prior tool versions keep working);
            #   - recognizable-but-partial output → safe to wipe.
            expected = {f"{t}.parquet" for t in datagen.GENERATORS}
            entries = set(os.listdir(sdir))
            foreign = {
                e for e in entries
                if e not in expected and not e.startswith("_")
            }
            if foreign:
                raise RuntimeError(
                    f"refusing to wipe {sdir}: it contains entries this "
                    f"tool never writes ({sorted(foreign)[:5]}…); move or "
                    "delete it manually, or point --workdir elsewhere"
                )
            have_all = all(
                os.path.exists(os.path.join(sdir, t, "_SUCCESS"))
                for t in expected
            )
            if have_all:
                print(f"# sf{sf:g} at {sdir} is complete legacy output "
                      f"(all tables + _SUCCESS) — adopting, not wiping")
                with open(marker, "w") as fh:
                    fh.write("complete\n")
                return sdir
            print(f"# sf{sf:g} at {sdir} is recognizable partial datagen "
                  f"output (no completion marker) — regenerating")
            shutil.rmtree(sdir)
        print(f"# generating sf{sf:g} under {sdir}")
        datagen.generate(spark, sf, sdir)
        with open(marker, "w") as fh:
            fh.write("complete\n")
    return sdir


def assert_scale_plans(spark, sdir: str) -> dict:
    """Plan-shape assertions the 100 TB posture depends on, executed at
    a rehearsal SF (not just the tiny test fixture):

    - salted_join == plain join on real fact/dim volumes;
    - AQE splits a genuinely skewed shuffle join (skew=true in the
      final adaptive plan);
    - the ngram df-cap rides the self-join exchange (ReusedExchange)
      at volume, i.e. the cap still adds no shuffle when the index is
      tens of millions of rows.
    Returns {check: bool}; raises nothing — the caller prints/records.
    """
    from pyspark.sql import functions as F

    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops import analytics
    from lime_etl_spark.registry import REGISTRY

    results: dict[str, bool] = {}

    orders = read_table(spark, sdir, "orders")
    cust = read_table(spark, sdir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        analytics.salted_join(
            orders.withColumnRenamed("o_custkey", "k"),
            cust.withColumnRenamed("c_custkey", "k"),
            key="k", salt=8,
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    results["salted_join_equivalence"] = sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

    # skew: collapse 30% of lineitem keys onto one value, join against
    # orders — a hot key big enough that AQE must split it. Disable the
    # broadcast escape hatch so the skewed SMJ path is actually taken.
    # the payload columns matter: a bare constant join key compresses to
    # ~nothing in the shuffle write, so the skewed partition never
    # crosses the byte threshold — carry random-mantissa doubles that
    # LZ4 cannot collapse, and aggregate them so pruning keeps them.
    li = read_table(spark, sdir, "lineitem").select(
        F.when(F.pmod(F.col("l_orderkey"), F.lit(10)) < 3, F.lit(0))
        .otherwise(F.col("l_orderkey")).alias("k"),
        "l_quantity", "l_extendedprice",
    )
    right = read_table(spark, sdir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    # The default skew trigger (partition > 256 MB AND > 5x median) is
    # sized for real executors; a rehearsal SF never crosses 256 MB, so
    # scale the byte threshold down and check the MECHANISM fires — the
    # production trigger point is AQE's own tuning, not ours.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    try:
        joined = li.join(right, "k").groupBy().agg(
            F.count(F.lit(1)), F.sum(F.col("l_quantity") * F.col("l_extendedprice") + F.col("o_totalprice"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        results["aqe_splits_skewed_join"] = "skew=true" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # collect(), not a noop write: a write spawns its OWN QueryExecution,
    # leaving df's plan un-executed — AQE's final plan (where exchange
    # reuse materializes) only exists on the executed instance.
    df = REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, sdir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one exploded-index subtree (sizes are narrow size(__sh) off the
    # pre-explode base since round 4) + the cap's sh exchange reused
    # across both self-join sides
    results["ngram_cap_reuses_exchange"] = (
        final.count("ReusedExchange") >= 2
        and final.count("Generate explode") == 1
    )
    return results


def _session(
    app: str,
    master: str | None,
    driver_mem: str | None,
    executor_mem: str | None = None,
):
    """Rehearsal session; ``master`` supports real multi-process runs
    (``local-cluster[N,cores,mem_mb]`` — separate executor JVMs +
    python workers, real serialization/broadcast transport, the closest
    thing to a cluster a single host offers). Executors inherit this
    process's env in local-cluster mode, but PYTHONPATH is pinned
    explicitly so their python workers can import lime_etl_spark even
    when the driver found it via sys.path manipulation."""
    from lime_etl_spark.ops.util import package_root
    from lime_etl_spark.session import get_spark

    extra = {}
    if master:
        extra["spark.executorEnv.PYTHONPATH"] = package_root()
        extra["spark.driver.memory"] = driver_mem or "8g"
        # local-cluster's [n,cores,mem] triple is the WORKER's capacity;
        # executors still launch with the spark.executor.memory default
        # (1g) unless told otherwise — and die in GC at rehearsal SFs,
        # relaunching in a loop (observed: 70+ executor incarnations)
        extra["spark.executor.memory"] = executor_mem or "6g"
    else:
        # plain local[N]: there ARE no separate executors, so an
        # executor-mem request is a no-op the user would misread as
        # applied — reject instead of silently ignoring (r4 ADVICE)
        if executor_mem:
            raise ValueError(
                "--executor-mem has no effect without --master "
                "local-cluster[...]; use --driver-mem to size the "
                "single local[N] JVM"
            )
        if driver_mem:
            # get_spark applies its own local default AFTER builder
            # .master(); extra_conf is applied last so this wins
            extra["spark.driver.memory"] = driver_mem
    return get_spark(app, master=master, extra_conf=extra)


def run(
    sfs: list[float],
    runs: int,
    workdir: str,
    queries: list[str] | None,
    master: str | None = None,
    driver_mem: str | None = None,
    executor_mem: str | None = None,
) -> dict:
    from lime_etl_spark.registry import REGISTRY
    from lime_etl_spark.tools import datagen

    spark = _session("scale-rehearsal", master, driver_mem, executor_mem)
    spark.sparkContext.setLogLevel("ERROR")
    # same JVM warmup as bench.py
    spark.range(1_000_000).selectExpr(
        "sum(cast(id as decimal(12,2))) s", "sum(id) t"
    ).write.format("noop").mode("overwrite").save()

    names = queries or [n for n, q in REGISTRY.items() if q.headline]
    out: dict = {"master": spark.sparkContext.master, "sfs": {}, "ratios": {}}
    for sf in sorted(sfs):
        sdir = _ensure_generated(spark, sf, workdir)
        timings: dict[str, list[float]] = {}
        for name in names:
            q = REGISTRY[name]
            timings[name] = []
            for _ in range(runs + 1):  # first run = cold, excluded from min
                start = time.perf_counter()
                q.spark_fn(spark, sdir).write.format("noop").mode("overwrite").save()
                timings[name].append(time.perf_counter() - start)
            print(f"sf{sf:g} {name}: {[round(t, 2) for t in timings[name]]}")
        out["sfs"][f"{sf:g}"] = {
            n: round(min(ts[1:]), 3) for n, ts in timings.items()
        }
    keys = sorted(sfs)
    for lo, hi in zip(keys, keys[1:]):
        data_ratio = hi / lo
        lo_t, hi_t = out["sfs"][f"{lo:g}"], out["sfs"][f"{hi:g}"]
        out["ratios"][f"sf{lo:g}->sf{hi:g}"] = {
            "data_ratio": data_ratio,
            "queries": {
                n: round(hi_t[n] / lo_t[n], 2) if lo_t[n] > 0 else None
                for n in lo_t
            },
        }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sfs", nargs="+", type=float, default=[0.1, 1.0])
    ap.add_argument("--runs", type=int, default=3, help="warm runs per query (min reported)")
    ap.add_argument("--workdir", default="/tmp", help="where generated SFs live")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--out", default=None, help="write full JSON here too")
    ap.add_argument(
        "--assert-plans", action="store_true",
        help="also run the skew/salted/exchange-reuse plan assertions at the LARGEST sf",
    )
    ap.add_argument(
        "--master", default=None,
        help="e.g. local-cluster[4,8,8192] for a real multi-process rehearsal",
    )
    ap.add_argument("--driver-mem", default=None)
    ap.add_argument("--executor-mem", default=None)
    args = ap.parse_args()
    result = run(
        args.sfs, args.runs, args.workdir, args.queries,
        master=args.master, driver_mem=args.driver_mem,
        executor_mem=args.executor_mem,
    )
    if args.assert_plans:
        spark = _session(
            "scale-rehearsal-plans", args.master, args.driver_mem, args.executor_mem
        )
        spark.sparkContext.setLogLevel("ERROR")
        sdir = _sf_dir(max(args.sfs), args.workdir)
        result["plan_assertions"] = {f"sf{max(args.sfs):g}": assert_scale_plans(spark, sdir)}
        spark.stop()
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
