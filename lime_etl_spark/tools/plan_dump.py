#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to files.

Usage: python plan_dump.py <repo> <sf_dir> <out_dir> <suffix> <name1> [name2 ...]

Writes <out_dir>/<name>_<suffix>.txt for each query. The <repo>
argument is prepended to sys.path so the same file dumps ANY checkout
(worktree of an older commit vs this tree) — the protocol behind the
plans/r{N}/*_{before,after}.txt deliverables.
"""
import os
import sys

repo, sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
names = sys.argv[5:]
sys.path.insert(0, repo)

from lime_etl_spark.registry import REGISTRY  # noqa: E402
from lime_etl_spark.session import get_spark  # noqa: E402

spark = get_spark("plan-dump")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)
for name in names:
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    text = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
spark.stop()
