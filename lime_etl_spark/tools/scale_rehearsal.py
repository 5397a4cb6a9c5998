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
import time


def _sf_dir(sf: float, workdir: str) -> str:
    # driver fixture for the SFs it ships; generated data beyond
    label = f"sf{sf:g}"
    fixture = f"/root/testdata/{label}"
    return fixture if os.path.isdir(fixture) else os.path.join(workdir, label)


def run(sfs: list[float], runs: int, workdir: str, queries: list[str] | None) -> dict:
    from lime_etl_spark.registry import REGISTRY
    from lime_etl_spark.session import get_spark
    from lime_etl_spark.tools import datagen

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # same JVM warmup as bench.py
    spark.range(1_000_000).selectExpr(
        "sum(cast(id as decimal(12,2))) s", "sum(id) t"
    ).write.format("noop").mode("overwrite").save()

    names = queries or [n for n, q in REGISTRY.items() if q.headline]
    out: dict = {"sfs": {}, "ratios": {}}
    for sf in sorted(sfs):
        sdir = _sf_dir(sf, workdir)
        if not os.path.isdir(sdir):
            print(f"# generating sf{sf:g} under {sdir}")
            datagen.generate(spark, sf, sdir)
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
    args = ap.parse_args()
    result = run(args.sfs, args.runs, args.workdir, args.queries)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
