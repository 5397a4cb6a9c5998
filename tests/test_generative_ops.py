"""Generative differential tests for the text / sampling / behavioral /
quality / graph operator surfaces (tools/opsgen.py) — round-8 extension
of the generative program to the last operators that had only
fixed-scenario evidence. The in-suite sweep is a bounded slice; the
committed artifact (GENCHECK_OPS_r08.json) records the full run.
"""

from __future__ import annotations

import pytest

from lime_etl_spark.tools.opsgen import check_seed as ops_check_seed

# No bring-up regression seeds: the 2,000-seed bring-up sweep ran clean
# (the one oracle fix during bring-up — concat_ws SKIPS NULL elements in
# pack_materialize — was an oracle-side correction, not an engine bug).
OPS_SWEEP = list(range(40))

# Two-tier suite (round-11): first 10 seeds in the driver-facing fast
# gate, the rest opt-in slow (depth carried by GENCHECK_OPS_r08*.json).
OPS_FAST = set(range(10))


@pytest.mark.parametrize(
    "seed",
    [s if s in OPS_FAST else pytest.param(s, marks=pytest.mark.slow) for s in OPS_SWEEP],
)
def test_ops_operator_matches_python_oracle(spark, seed):
    rec = ops_check_seed(spark, seed)
    assert "error" not in rec, f"seed {seed}: {rec['error']} ops={rec.get('ops')}"
    assert "mismatch" not in rec, f"seed {seed}: {rec['mismatch']} ops={rec['ops']}"
