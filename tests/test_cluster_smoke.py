"""Cross-process smoke: the engine must work when executors are real
separate JVMs, not threads in the driver.

The full multi-process story is measured by
`tools/scale_rehearsal.py --master local-cluster[...]` at sf1
(BENCH_cluster_rehearsal.json); this test keeps the PATH green per
round at fixture scale — closure serialization, broadcast transport,
and Arrow batches each crossing a real process boundary — so a
regression shows up in `pytest tests/` instead of at the next manual
rehearsal.

Runs in a subprocess: the pytest session already owns a `local[N]`
SparkSession, and `getOrCreate` inside the same JVM would silently
reuse it instead of building the local-cluster one.
"""

from __future__ import annotations
import pytest

import subprocess
import sys

_SMOKE = r"""
import os
from lime_etl_spark.ops.util import package_root
from lime_etl_spark.session import get_spark
from lime_etl_spark.registry import REGISTRY

pkg_root = package_root()
spark = get_spark(
    "cluster-smoke",
    master="local-cluster[2,2,1536]",
    shuffle_partitions=4,
    extra_conf={
        "spark.executor.memory": "1g",
        "spark.executorEnv.PYTHONPATH": pkg_root,
    },
)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ["LIME_SMOKE_SF_DIR"]
checks = {
    # JVM relational path: joins + aggregates across the shuffle
    "q5_region_revenue": 1,
    # Arrow kernel path: pandas_udf batches cross the process boundary
    "embedding_centroids": 1,
    # broadcast + window path
    "window_customer_spend": 1,
    # iterative path: connected components' localCheckpoint loop writes
    # blocks on real executors (verified cross-process in round 4)
    "dedup_components": 0,
}
for name, min_rows in checks.items():
    n = REGISTRY[name].spark_fn(spark, sf).count()
    assert n >= min_rows, (name, n)
    print(f"{name}:{n}", flush=True)
spark.stop()
print("CLUSTER_SMOKE_OK")
"""


@pytest.mark.slow
def test_engine_runs_on_local_cluster(sf_dir):
    import os

    from lime_etl_spark.ops.util import package_root

    pkg_root = package_root()
    proc = subprocess.run(
        [sys.executable, "-c", _SMOKE],
        capture_output=True,
        text=True,
        timeout=420,
        # the fixture dir comes from conftest's sf_dir (env-overridable)
        # so the smoke cannot drift out of sync with the suite (r4 ADVICE)
        env={**os.environ, "PYTHONPATH": pkg_root, "LIME_SMOKE_SF_DIR": sf_dir},
        cwd=pkg_root,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CLUSTER_SMOKE_OK" in proc.stdout, proc.stdout
