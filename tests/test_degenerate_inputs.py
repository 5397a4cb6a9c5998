"""Registry-wide degenerate-input sweep (round-4 verdict task 5).

Rounds 3-4 found NULL-on-empty bugs piecemeal (funnel report, quality
validate, AxisError in numpy kernels fed a (0,)-shaped batch). This
generalizes the check: EVERY registry query runs against an EMPTY
(0-row, schema-correct) and a 1-ROW fixture dir, asserting

1. no exception — collect() completes on both (the bar that caught two
   real AxisErrors in ann_cosine_topk_arrow / ann_ivf_topk when this
   sweep was first run), and
2. sane zero/NULL semantics — for oracled queries, the DuckDB oracle
   run over the SAME degenerate parquet agrees on row count and values
   (the bar that caught seven engine-vs-oracle divergences: Spark's
   zero-row rollup/cube/grouping-sets on empty input vs ANSI's ()
   grand-total row, un-coalesced SQL sums in the two quality-report
   oracles, and an unguarded `// 0` in the two z-order oracles).

The degenerate dirs are DERIVED from the real fixture via pyarrow
(slice 0 / slice 1 of each table), so schemas — including the events
table's TIMESTAMP(NANOS) physical encoding — stay bit-identical to
what the driver ships; only the row count degenerates.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from lime_etl_spark.registry import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def degenerate_dirs(tmp_path_factory, sf_dir):
    import pyarrow.parquet as pq

    dirs = {}
    for label, n in (("empty", 0), ("one", 1)):
        d = tmp_path_factory.mktemp(f"sf_{label}")
        for t in TABLES:
            tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
            pq.write_table(tbl.slice(0, n), str(d / f"{t}.parquet"))
        dirs[label] = str(d)
    return dirs


@pytest.fixture(scope="module")
def ducks(degenerate_dirs):
    cons = {}
    for label, d in degenerate_dirs.items():
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        cons[label] = con
    yield cons
    for con in cons.values():
        con.close()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else v.hex()
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_query_survives_degenerate_inputs(
    name, spark, degenerate_dirs, ducks
):
    q = REGISTRY[name]
    for label in ("empty", "one"):
        sdf = q.spark_fn(spark, degenerate_dirs[label])
        spark_rows = [tuple(r) for r in sdf.collect()]  # 1: no exception
        if q.oracle is None:
            continue
        rel = ducks[label].sql(q.oracle)
        duck_rows = rel.fetchall()
        assert len(spark_rows) == len(duck_rows), (
            f"{name} on {label} input: row count spark={len(spark_rows)} "
            f"duck={len(duck_rows)}"
        )
        s_set = _rowset(spark_rows, sdf.columns)
        d_set = _rowset(duck_rows, list(rel.columns))
        mismatches = [(a, b) for a, b in zip(s_set, d_set) if a != b]
        assert not mismatches, (
            f"{name} on {label} input: value mismatches {mismatches[:5]}"
        )


# Columns whose non-nullness the fixture contract PINS
# (tests/test_fixture_contract.py) — a regeneration cannot null these
# without failing the contract, so the null sweep leaves them intact.
# Join/identity keys are also left intact: nulling them changes result
# SETS (inner joins drop rows in both engines identically) without
# probing any new semantics, while exploding the mismatch surface.
_CONTRACT_NON_NULL = {
    "events": {"event_id", "ts", "user_id"},
    "lineitem": {"l_extendedprice", "l_discount", "l_tax", "l_quantity",
                 "l_shipdate", "l_returnflag"},
    "documents": {"doc_id", "text", "lang", "n_chars"},
    "embeddings": {"vec_id", "embedding"},
}
_KEY_COLUMNS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "doc_id", "vec_id", "event_id",
}


@pytest.fixture(scope="module")
def nulled_dir(tmp_path_factory, sf_dir):
    """The fixture with every 7th row NULLed in each column the fixture
    contract does NOT pin non-null. The driver regenerates fixtures
    between rounds; NULLs appearing in uncontracted columns is a legal
    regeneration this sweep makes survivable in advance — it caught the
    Spark-NULLS-FIRST vs DuckDB-NULLS-LAST window-ordering divergence
    (three oracles now pin NULLS FIRST explicitly)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_nulled")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        n = tbl.num_rows
        keep = pa.array(~(np.arange(n) % 7 == 3))
        cols = []
        for field in tbl.schema:
            col = tbl.column(field.name)
            if field.name in _KEY_COLUMNS or field.name in _CONTRACT_NON_NULL.get(t, set()):
                cols.append(col)
            else:
                cols.append(pc.if_else(keep, col.combine_chunks(), pa.nulls(n, field.type)))
        pq.write_table(
            pa.table(dict(zip(tbl.schema.names, cols))), str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def nulled_duck(nulled_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{nulled_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
)
def test_registry_query_matches_oracle_on_nulled_input(
    name, spark, nulled_dir, nulled_duck
):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, nulled_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = nulled_duck.sql(q.oracle)
    duck_rows = rel.fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"{name} on nulled input: row count spark={len(spark_rows)} "
        f"duck={len(duck_rows)}"
    )
    s_set = _rowset(spark_rows, sdf.columns)
    d_set = _rowset(duck_rows, list(rel.columns))
    mismatches = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert not mismatches, (
        f"{name} on nulled input: value mismatches {mismatches[:5]}"
    )


def test_similarity_defaults_tolerate_empty_corpus(spark, degenerate_dirs):
    """The n_planes/n_clusters=None auto-sizing paths clamp the corpus
    count at 1, so an empty corpus sizes to the minimum instead of
    tripping recommended_*'s explicit-input validation."""
    from lime_etl_spark.io.sources import read_table
    from lime_etl_spark.ops import similarity as S

    emb = read_table(spark, degenerate_dirs["empty"], "embeddings")
    assert S.embedding_near_dup_bucketed(emb, 64).count() == 0
    assert S.embedding_near_dup_bucketed_arrow(emb, 64).count() == 0
    assert S.lsh_bucketed_topk(emb, emb, 64).count() == 0
    assert S.ivf_topk(emb, emb, 64).count() == 0
    assert S.cosine_topk_arrow(emb, emb).count() == 0
