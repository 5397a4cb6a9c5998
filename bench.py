#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the registry's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no write cost, no driver collect). JVM/session startup is excluded;
per-query time includes planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lime_etl_spark.registry import REGISTRY  # noqa: E402
from lime_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Committed quiet band for the two fixed calibration microbenches
# (round-11, VERDICT r10 task #4): the [min, max] observed across the
# round-10 quiet samples (BENCH_r10_quiet_samples.json,
# BENCH_r10_final_quiet_samples.json) and this round's quiet captures.
# The one-line artifact reports each calibration's DEVIATION from this
# band (measured/band_max when above, measured/band_min when below,
# 1.0 inside), so a load-contaminated official capture identifies
# itself mechanically: jvm_dev >> 1 means the recording host's JVM was
# that factor slower than any quiet observation of this same code, and
# per-query "regressions" of about that factor on unchanged plans are
# host noise, not plan changes (the r10 adjudication, now arithmetic).
CALIBRATION_QUIET_BAND = {
    "python_md5_2m_sec": (0.29, 0.33),
    "spark_decimal_agg_1m_sec": (0.19, 0.28),
}


def band_deviation(measured: float, band: tuple[float, float]) -> float:
    lo, hi = band
    if measured > hi:
        return round(measured / hi, 2)
    if measured < lo:
        return round(measured / lo, 2)
    return 1.0


def sf_of(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def exec_metric(eager_plan: bool, fresh_warm: float, exec_min: float) -> float:
    """The exec-only number published per query. For queries whose
    construction EXECUTES jobs (Query.eager_plan — e.g. the
    connected-components convergence loop), re-running the built
    DataFrame times only the final projection (measured 76x under the
    real cost at sf0.1, r5 verdict), so fresh-plan warm is the honest
    exec metric for them; everyone else gets the built-plan re-run."""
    return fresh_warm if eager_plan else exec_min


def main() -> None:
    # Pin the collector explicitly (r6 verdict task 7): Java 17 defaults
    # to G1 but the default heap floor (-Xms) lets the 32 GiB bench heap
    # grow in steps, and each growth step is a full-heap resize pause
    # that lands in whichever query is running — part of the ±4%
    # adjudication noise. Fixing -Xms to a working-set-sized floor and
    # stating G1 outright makes the JVM identical run-to-run; the
    # per-query [min, max] warm spread below makes residual variance
    # visible in the artifact instead of argued about.
    spark = get_spark(
        "lime_etl_spark-bench",
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseG1GC -Xms8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM paths the queries share (codegen, parquet reader,
    # shuffle machinery) with a job that does no query-specific work, so
    # per-query numbers measure the queries, not first-job JIT.
    def _warmup_job():
        spark.range(1_000_000).selectExpr(
            "sum(cast(id as decimal(12,2)) * (1 - cast(id % 7 as decimal(6,4)) / 100)) s",
            "sum(id) t",
        ).write.format("noop").mode("overwrite").save()

    _warmup_job()
    # Host calibration (round 8): the same commit measured 9.5-10.0 s on
    # the round-7 host and 15+ s on the round-8 one — per-round VMs
    # differ in single-core speed and noise. Two fixed microbenches make
    # cross-round comparisons mechanical: normalize query totals by the
    # calibration ratio before adjudicating a "regression" across
    # rounds. Both are min-of-3 AFTER the warmup job, so JIT/first-job
    # cost is excluded from the calibration too.
    import hashlib as _hl

    def _py_bench() -> float:
        t0 = time.perf_counter()
        h = _hl.md5()
        for i in range(2_000_000):
            h.update(str(i).encode())
        return time.perf_counter() - t0

    def _jvm_bench() -> float:
        t0 = time.perf_counter()
        _warmup_job()
        return time.perf_counter() - t0

    host_calibration = {
        "python_md5_2m_sec": round(min(_py_bench() for _ in range(3)), 3),
        "spark_decimal_agg_1m_sec": round(min(_jvm_bench() for _ in range(3)), 3),
        "note": (
            "fixed single-core CPython loop + fixed 1M-row JVM decimal "
            "aggregate, min of 3 warm runs; divide query totals by the "
            "round-over-round ratio of these before calling a plan "
            "regression across hosts"
        ),
    }
    from lime_etl_spark.io.sources import read_table

    read_table(spark, SF_DIR, "region").write.format("noop").mode("overwrite").save()

    # Each query runs twice: the first execution pays one-time plan
    # compilation + whole-stage-codegen JIT (~1-3 s/query, measured 3-8x
    # the execution itself at this SF — noise at 100 TB, dominant at
    # sf0.1). Reported per-query numbers are the MINIMUM of two warm
    # runs — back-to-back warm timings on this shared host vary ±15%
    # from neighbor load (measured: the same commit benched 12.0s /
    # 12.5s / 14.5s / 12.2s across an hour), and min-of-warm is the
    # standard noise-robust estimator of the code's actual cost. The
    # cold (first-run) pass is recorded alongside, not hidden.
    headline = [(n, q) for n, q in REGISTRY.items() if q.headline]
    timings: dict[str, float] = {}
    exec_timings: dict[str, float] = {}
    warm_spread: dict[str, list[float]] = {}
    exec_spread: dict[str, list[float]] = {}
    total = 0.0
    cold_total = 0.0
    exec_total = 0.0
    for name, q in headline:
        start = time.perf_counter()
        q.spark_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold_total += time.perf_counter() - start
        warm = []
        for _ in range(2):
            start = time.perf_counter()
            q.spark_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            warm.append(time.perf_counter() - start)
        elapsed = round(min(warm), 3)
        timings[name] = elapsed
        warm_spread[name] = [round(min(warm), 3), round(max(warm), 3)]
        total += elapsed
        # Execution-only: re-run an ALREADY-BUILT DataFrame, so Catalyst
        # analysis/optimization/codegen (fixed per-plan overhead,
        # amortized to nothing at 100 TB) is excluded and only the data
        # path is timed. Measured: warm fresh-plan runs are ~90%
        # plan-compile at sf0.1 (e.g. ngram_jaccard 2.5s fresh vs 0.23s
        # execution). Both numbers are published; `value` stays the
        # fresh-plan warm total (the driver's comparable headline).
        # eager_plan queries skip the built-plan re-run entirely — it
        # would time only the final projection (see exec_metric).
        if not q.eager_plan:
            built = q.spark_fn(spark, SF_DIR)
            built.write.format("noop").mode("overwrite").save()  # compile this plan
            execs = []
            for _ in range(2):  # min-of-2: single exec runs swing 4x on GC at sf>=1
                start = time.perf_counter()
                built.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - start)
        else:
            execs = [float("inf")]
        exec_elapsed = round(exec_metric(q.eager_plan, elapsed, min(execs)), 3)
        exec_timings[name] = exec_elapsed
        if not q.eager_plan:
            exec_spread[name] = [round(min(execs), 3), round(max(execs), 3)]
        exec_total += exec_elapsed
    # The full detail record (spreads, run protocol, JVM pin) goes to a
    # sidecar file; stdout carries ONE compact headline line as the LAST
    # line. Round 7's artifact was unparsable ("parsed": null) because
    # the r6-grown single line overflowed the driver's tail-capture
    # window and truncated at the FRONT — the headline must stay small
    # and last (r7 verdict, What's wrong #1 / next-round #2).
    detail = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "cold_total_sec": round(cold_total, 3),
        "exec_only_total_sec": round(exec_total, 3),
        "exec_only_queries": exec_timings,
        # self-describing artifact (r5 verdict): these queries
        # execute eagerly at plan construction, so their
        # exec-only entry IS their fresh-plan warm time
        "eager_plan_queries": [n for n, q in headline if q.eager_plan],
        # total executions per query: standard = 1 cold + 2
        # warm + 1 plan-compile + 2 exec-only; eager_plan =
        # 1 cold + 2 warm (the built-plan re-run is skipped —
        # it would time only the final projection)
        "runs_per_query": {"standard": 6, "eager_plan": 3},
        "steady_state": "min of 2 warm runs",
        # [min, max] across the warm / exec-only runs, so ±noise
        # adjudications are mechanical (r6 verdict task 7); the
        # JVM runs pinned G1 with a fixed -Xms floor
        "warm_spread": warm_spread,
        "exec_spread": exec_spread,
        "jvm": "G1, -Xms8g floor, 32g heap",
        "host_calibration": host_calibration,
        "calibration_quiet_band": {
            k: list(v) for k, v in CALIBRATION_QUIET_BAND.items()
        },
        "calibration_band_dev": {
            k: band_deviation(host_calibration[k], band)
            for k, band in CALIBRATION_QUIET_BAND.items()
        },
    }
    # Sidecar named by (cpus, sf) so a scaling run (the driver re-runs
    # at a lower core count) no longer clobbers the 32-core per-query
    # exec-only record (r10 verdict "What's wrong" #5). The legacy
    # un-suffixed name is still written for one release so existing
    # tooling keeps working; the one-line artifact points at the
    # suffixed file.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_tag = str(sf_of(SF_DIR)).replace("-1.0", "unknown")
    sidecar_name = f"BENCH_detail_c{cpus}_sf{sf_tag}.json"
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in (sidecar_name, "BENCH_detail.json"):
        with open(os.path.join(here, fname), "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
                "exec_only_total_sec": round(exec_total, 3),
                # carried in the DRIVER-RECORDED line (r8 verdict #5) so
                # cross-round normalization is arithmetic on BENCH_r{N}
                # artifacts alone: divide totals by the round-over-round
                # ratio of these two fixed microbenches
                "host_calibration": {
                    k: v for k, v in host_calibration.items() if k != "note"
                },
                # deviation of each calibration from the committed quiet
                # band (1.0 = inside; >1 = host slower than every quiet
                # observation by that factor) — additions-only, r10
                # verdict task #4
                "calibration_band_dev": {
                    k: band_deviation(host_calibration[k], band)
                    for k, band in CALIBRATION_QUIET_BAND.items()
                },
                "detail": sidecar_name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
