"""Cross-surface composition sweeps (tools/composegen.py) + the
independent-math third-implementation check (tools/llmgen.py
--independent-math) — round-9 verdict tasks #1 and #2.

The committed artifacts (GENCHECK_COMPOSE_r09.json,
GENCHECK_INDEP_MATH_r09.json) carry the volume; these keep a slice of
both harnesses in every suite run so a regression in a stage oracle,
a seam, or the mpmath rounding contract fails CI, not just the next
artifact sweep.
"""

from __future__ import annotations

import pytest

from lime_etl_spark.tools.composegen import check_seed as compose_check_seed
from lime_etl_spark.tools.llmgen import independent_math_seed

# a slice through all five families (text_chain agg+pack, quality_pack,
# dedup_dedup, semantic both twins, ingest_chain with re-deliveries)
COMPOSE_SWEEP = range(0, 8)
INDEP_SWEEP = range(0, 2)

# Two-tier suite (round-11): two compose seeds stay in the driver-facing
# fast gate (each ~15-55 s); the rest, and the mpmath third-implementation
# sweep (~90 s), are opt-in slow — depth carried by the committed
# GENCHECK_COMPOSE_* / GENCHECK_INDEP_MATH_* artifacts.
COMPOSE_FAST = {0, 1}


@pytest.mark.parametrize(
    "seed",
    [
        s if s in COMPOSE_FAST else pytest.param(s, marks=pytest.mark.slow)
        for s in COMPOSE_SWEEP
    ],
)
def test_composed_chain_matches_composed_oracle(spark, seed):
    rec = compose_check_seed(spark, seed)
    assert "error" not in rec, f"seed {seed}: {rec['error']} ops={rec.get('ops')}"
    assert "mismatch" not in rec, f"seed {seed}: {rec['mismatch']} ops={rec['ops']}"


@pytest.mark.slow
@pytest.mark.parametrize("seed", INDEP_SWEEP)
def test_engine_cosines_match_mpmath(spark, seed):
    rec = independent_math_seed(spark, seed)
    assert "mismatch" not in rec, f"seed {seed}: {rec['mismatch']}"
    assert rec["rows"] > 0
