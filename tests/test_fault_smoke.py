"""Per-round fault-tolerance smoke (round-4 verdict task 1).

The full rehearsal (executor SIGKILL on local-cluster, streaming
mid-write death, sf1) is `tools/fault_check.py` → FAULT_CHECK.json;
this keeps the retry PATH green in `pytest tests/` at fixture scale:
a task that fails its first attempt and succeeds on retry must produce
checksum-identical results, both when the failure hits the source scan
and when it hits the final stage mid-stream.

Runs in a subprocess because task retries need a `local[N,4]` master
(plain local[N] has maxFailures=1 — the first injected failure would
kill the job, which is also why this regime stayed unexecuted until
round 5) and the pytest session already owns a local[N] JVM.
"""

from __future__ import annotations
import pytest

import os
import subprocess
import sys

_SMOKE = r"""
import os
from lime_etl_spark.session import get_spark
from lime_etl_spark.registry import REGISTRY
from lime_etl_spark.tools.fault_check import inject_faults, _patch_sources
from lime_etl_spark.tools.spill_check import content_checksum

spark = get_spark(
    "fault-smoke", master="local[4,4]", shuffle_partitions=4,
    extra_conf={"spark.driver.memory": "4g"},
)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ["LIME_SMOKE_SF_DIR"]
for name in ("q1_pricing_summary", "dedup_embedding_cosine_bucketed"):
    q = REGISTRY[name]
    clean = content_checksum(q.spark_fn(spark, sf))
    c1 = spark.sparkContext.accumulator(0)
    undo = _patch_sources(spark, c1, mode="before")
    try:
        src = content_checksum(q.spark_fn(spark, sf))
    finally:
        undo()
    assert src == clean, (name, "retry_source", src, clean)
    assert c1.value > 0, (name, "no source-retry observed")
    c2 = spark.sparkContext.accumulator(0)
    snk = content_checksum(
        inject_faults(q.spark_fn(spark, sf), counter=c2, mode="midstream")
    )
    assert snk == clean, (name, "retry_sink", snk, clean)
    assert c2.value > 0, (name, "no sink-retry observed")
    print(f"{name}: retries src={c1.value} sink={c2.value}", flush=True)
spark.stop()
print("FAULT_SMOKE_OK")
"""


@pytest.mark.slow
def test_task_retries_are_deterministic(sf_dir):
    from lime_etl_spark.ops.util import package_root

    pkg_root = package_root()
    proc = subprocess.run(
        [sys.executable, "-c", _SMOKE],
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "PYTHONPATH": pkg_root, "LIME_SMOKE_SF_DIR": sf_dir},
        cwd=pkg_root,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FAULT_SMOKE_OK" in proc.stdout, proc.stdout


def test_connected_components_reliable_checkpoint_parity(spark, sf_dir, tmp_path):
    """reliable_checkpoint_dir must be a pure durability swap — same
    components as the localCheckpoint default."""
    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops import dedup

    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dups(docs, threshold=0.5).select("id_a", "id_b")
    local = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    # r6: the reliable path materializes rounds as parquet under its own
    # cc_* subdir and never touches the session-global checkpoint dir —
    # pin that by setting the global first and asserting it is UNCHANGED
    prev = str(tmp_path / "prior_ckpt")
    spark.sparkContext.setCheckpointDir(prev)
    before = spark.sparkContext.getCheckpointDir()
    reliable = sorted(
        map(
            tuple,
            dedup.connected_components(
                pairs, reliable_checkpoint_dir=str(tmp_path / "ckpt")
            ).collect(),
        )
    )
    assert spark.sparkContext.getCheckpointDir() == before
    assert local == reliable
    assert len(local) > 0
    # round files exist under a per-call cc_* subdir of the caller's dir
    cc_dirs = list((tmp_path / "ckpt").glob("cc_*"))
    assert len(cc_dirs) == 1, cc_dirs
    assert list(cc_dirs[0].glob("round_*")), "expected per-round parquet dirs"


def test_connected_components_reliable_concurrent_calls(spark, sf_dir, tmp_path):
    """Two reliable-checkpoint component jobs running CONCURRENTLY in one
    session must not cross-write (the r5 setCheckpointDir implementation
    forbade this; r6's per-call subdirs make it safe)."""
    import threading

    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops import dedup

    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_dups(docs, threshold=0.5).select("id_a", "id_b")
    expected = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    results: dict = {}

    def run(tag: str) -> None:
        try:
            results[tag] = sorted(
                map(
                    tuple,
                    dedup.connected_components(
                        pairs, reliable_checkpoint_dir=str(tmp_path / "shared")
                    ).collect(),
                )
            )
        except Exception as ex:  # surface in the assert below
            results[tag] = repr(ex)

    threads = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"] == expected, results["a"] if isinstance(results["a"], str) else "mismatch"
    assert results["b"] == expected, results["b"] if isinstance(results["b"], str) else "mismatch"
    # two calls -> two distinct cc_* subdirs under the shared root
    assert len(list((tmp_path / "shared").glob("cc_*"))) == 2
