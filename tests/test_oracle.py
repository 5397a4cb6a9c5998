"""DuckDB-oracle differential tests — local replica of the driver's
CORRECTNESS gate (BASELINE.md t2): for every registry query with an
oracle, run Spark and DuckDB over the same parquet and compare row
count, column names, and order-insensitive values.

Runs at sf0.001 by default for speed; set SPARK_GRAFT_ORACLE_SF_DIR to
/root/testdata/sf0.01 to replicate the driver's exact scale.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from lime_etl_spark.registry import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{oracle_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(value):
    """Canonicalize a cell for order-insensitive comparison.

    Floats compare at FULL precision (hex) — the engine's decimal-money
    and portable-hash design makes every oracled query bit-exact across
    engines (audited), so the local gate holds the same bar a raw value
    hash would."""
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return value.hex()
    return value


def _rowset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)

# Declared-type correspondence: the driver hashes RAW values, so a DuckDB
# HUGEINT (int128) next to a Spark bigint mismatches even when every value
# is equal — exactly how events_sessionized went red in round 1 while this
# gate (comparing post-fetch Python objects) stayed green. Pin the allowed
# (spark dtype -> duckdb type) pairs; anything else (HUGEINT above all)
# must be CAST in the oracle.
TYPE_TWINS = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    # session TZ is pinned to UTC, so instant and wall-clock agree
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "date": {"DATE"},
    "array<double>": {"DOUBLE[]"},
    "array<int>": {"INTEGER[]"},
    "array<bigint>": {"BIGINT[]"},
    "array<string>": {"VARCHAR[]"},
}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, duck, oracle_sf_dir):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, oracle_sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    rel = duck.sql(q.oracle)
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    duck_rows = rel.fetchall()
    duck_cols = [c for c in rel.columns]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    for col, sdt in sdf.dtypes:
        allowed = TYPE_TWINS.get(sdt)
        assert allowed is not None and duck_types[col] in allowed, (
            f"{name}.{col}: spark dtype {sdt!r} vs duckdb {duck_types[col]!r} "
            f"would mismatch under the driver's raw-value hash "
            f"(allowed twins: {sorted(allowed) if allowed else 'none declared'})"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_set, d_set = _rowset(spark_rows, spark_cols), _rowset(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
