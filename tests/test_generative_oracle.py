"""Generative differential tests: seeded random query compositions
(tools/qgen.py) run through the engine's operator surface AND through
DuckDB, compared order-insensitively — the interaction-bug detector the
139 fixed registry queries cannot be (VERDICT r6 top task).

The in-suite sweep is a bounded slice; the committed artifact
(GENCHECK_r07*.json, produced by `python -m lime_etl_spark.tools.gencheck`)
records the full multi-thousand-seed runs.
"""

from __future__ import annotations

import pytest

from lime_etl_spark.tools.gencheck import check_seed, duck_connect
from lime_etl_spark.tools.qgen import generate_query

# Seeds that exposed real generator/engine integration bugs during
# development — pinned forever as regressions:
#  - 16: DuckDB date_trunc('month') returns DATE vs Spark TIMESTAMP
#  - 29/136: empty window ORDER BY after a global aggregate
#  - 39/70/93: aggregate alias collision when an agg feeds another agg
#  - 100/139: total order assumed (l_orderkey, l_linenumber) unique;
#    the fixture's lineitem has no unique key -> all-columns tiebreak
#  - 342/423/827/1890: second union_all reused the 'branch' tag name —
#    duplicate column in SQL, silently REPLACED by Spark's withColumn
# NOTE: the generator's op menu has grown since these were caught, so a
# pinned seed no longer reproduces its original pipeline byte-for-byte;
# the fixes are structural (always-on: alias counters, all-columns
# tiebreak, unique tags) and the seeds stay as extra sweep coverage.
#  - 1869: Spark 4.1.2 unionOutputPartitioning unsoundness — split hash
#    groups / exceptAll no-op (pinned off in the session factory;
#    focused repro in test_plans.py::test_union_output_partitioning_unsound)
#  - 2040/2481: self_outer on a key-only relation crashed randint(1, 0)
REGRESSION_SEEDS = [
    16, 29, 39, 70, 93, 100, 136, 139, 342, 423, 827, 1869, 1890,
    2040, 2481,
]

SWEEP = list(range(120))

# Two-tier suite (round-11): every pinned regression seed plus the first
# 20 sweep seeds stay in the driver-facing fast gate; the rest of the
# sweep is opt-in slow (LIME_FULL_SUITE=1) — depth carried by the
# committed GENCHECK_r* artifacts (thousands of seeds, up to sf10).
FAST_SEEDS = set(REGRESSION_SEEDS) | set(range(20))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "seed",
    [
        s if s in FAST_SEEDS else pytest.param(s, marks=pytest.mark.slow)
        for s in sorted(set(REGRESSION_SEEDS) | set(SWEEP))
    ],
)
def test_generated_composition_matches_oracle(spark, duck, sf_dir, seed):
    rec = check_seed(spark, duck, seed, sf_dir)
    assert "error" not in rec, f"seed {seed}: {rec['error']}\n{rec.get('sql')}"
    assert "mismatch" not in rec, (
        f"seed {seed}: {rec['mismatch']}\nops={rec['ops']}\nsql={rec['sql']}"
    )


def test_generator_is_deterministic(spark, sf_dir):
    """Same seed -> byte-identical SQL and op chain (resume/repro
    contract for pinned regression seeds)."""
    for seed in (7, 100, 1999):
        a = generate_query(seed, spark, sf_dir)
        b = generate_query(seed, spark, sf_dir)
        assert a.sql == b.sql and a.ops == b.ops


def test_generator_covers_operator_vocabulary(spark, sf_dir):
    """A modest seed range must exercise every op family — guards
    against a weight/gating regression silently dropping coverage."""
    seen: set[str] = set()
    for seed in range(800):
        # plans are built but never executed — this stays cheap
        rel = generate_query(seed, spark, sf_dir)
        seen.update(op.split(":")[0] for op in rel.ops)
        if seen.issuperset(EXPECTED_FAMILIES):
            break
    missing = EXPECTED_FAMILIES - seen
    assert not missing, f"op families never generated: {sorted(missing)}"


EXPECTED_FAMILIES = {
    "base", "filter", "derive", "project", "inner", "left", "left_semi",
    "left_anti", "salted", "asof", "group", "rollup", "cube", "having",
    "rank", "dense_rank",
    "row_number", "topk", "running", "lag_lead", "part_sum", "moving",
    "ntile", "first_last", "union_all", "union_distinct", "intersect",
    "except_all", "except_distinct", "distinct", "sort_limit",
    "dropna", "rename", "keep_latest", "self_outer",
}
