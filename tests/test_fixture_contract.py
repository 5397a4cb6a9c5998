"""THE fixture contract: every property of /root/testdata the oracle
suite relies on, in one place (round-3 task).

The grading driver REGENERATES the fixtures between rounds. Most
regressions that could cause would not show as red oracle rows — both
engines read the same parquet, so a changed value domain usually makes
a query silently empty (rows still match) or flips a literal-window to
zero coverage. This module turns each such assumption into a named
assertion so a regeneration fails loudly with the assumption's name
and the queries that rely on it, not as a hash diff (or worse, a
silently-degenerate green gate).

Checks run through DuckDB (no JVM start — the whole module is
sub-second) except the parquet physical-encoding probe, which uses
pyarrow. Schema normalization itself is covered Spark-side by
tests/test_scale_paths.py::test_read_table_normalizes_fixture_schemas;
the char-vs-byte ASCII guard also lives in test_scale_paths.py (kept
there because it documents the multimodal_resized oracle) and is
enumerated here for completeness.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest

# the fixture ROOT derives from the same source as conftest's sf_dir
# (env-overridable) so this contract cannot silently drift out of sync
# with the suite if the fixture location moves (r4 ADVICE)
from conftest import SF_DIR as _CONFTEST_SF_DIR  # noqa: E402

TESTDATA_ROOT = os.path.dirname(_CONFTEST_SF_DIR.rstrip("/"))
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _p(sf: str, table: str) -> str:
    return os.path.join(TESTDATA_ROOT, sf, f"{table}.parquet")


def _one(con, sql):
    return con.sql(sql).fetchone()[0]


@pytest.mark.parametrize("sf", SFS)
def test_all_tables_present_nonempty(con, sf):
    """Every registered view the driver's oracle harness creates must
    exist with rows — a missing/empty table greens trivially."""
    for t in TABLES:
        assert os.path.exists(_p(sf, t)), f"{sf}/{t} missing"
        assert _one(con, f"select count(*) from '{_p(sf, t)}'") > 0, f"{sf}/{t} empty"


@pytest.mark.parametrize("sf", SFS)
def test_events_contract(con, sf):
    p = _p(sf, "events")
    # funnel steps (funnel_*, streaming_funnel: signup->view->purchase)
    # and the asof query's click->purchase pairing are LITERALS in both
    # the Spark body and the SQL oracle — an absent type empties them
    types = {r[0] for r in con.sql(f"select distinct event_type from '{p}'").fetchall()}
    assert {"signup", "view", "purchase", "click"} <= types, types
    # deterministic tiebreaks (dedup_latest_event_per_user, scd2/funnel
    # maintainers, window_event_features) require a UNIQUE event_id
    assert _one(con, f"select count(*) - count(distinct event_id) from '{p}'") == 0
    # every windowed/sessionized oracle assumes non-null ts and user_id
    assert _one(con, f"select count(*) from '{p}' where ts is null or user_id is null") == 0
    # cohort_weekly_retention and the 7-day funnel window need a span
    # of at least two weeks to produce non-degenerate offsets
    assert _one(con, f"select date_diff('day', min(ts), max(ts)) from '{p}'") >= 14


@pytest.mark.parametrize("sf", SFS)
def test_events_ts_physical_encoding_handled(sf):
    """read_table + the streaming footer probe handle exactly two ts
    encodings: TIMESTAMP(NANOS) (via nanosAsLong) and TIMESTAMP(MICROS).
    A regeneration to millis/int96/string would silently break the
    normalization contract — pin the universe here."""
    files = glob.glob(os.path.join(TESTDATA_ROOT, sf, "events.parquet"))
    assert files
    for f in files:
        t = pq.read_schema(f).field("ts").type
        assert str(t) in ("timestamp[ns]", "timestamp[us]"), str(t)


@pytest.mark.parametrize("sf", SFS)
def test_lineitem_contract(con, sf):
    p = _p(sf, "lineitem")
    # q1/q6/q14 (and the date_funcs/window oracles) filter on literal
    # windows inside [1996-01-01, 1998-01-01) — the fixture's date
    # range must cover them or the gates go green-but-empty
    lo, hi = con.sql(f"select min(l_shipdate), max(l_shipdate) from '{p}'").fetchone()
    assert str(lo) <= "1996-01-01", lo
    assert str(hi) >= "1998-01-01", hi
    # q1 groups by (returnflag, linestatus); the canonical A/N/R domain
    # keeps its 6-row output shape
    flags = {r[0] for r in con.sql(f"select distinct l_returnflag from '{p}'").fetchall()}
    assert flags == {"A", "N", "R"}, flags
    # money aggregates assume non-null price/discount/tax
    assert _one(
        con,
        f"select count(*) from '{p}' where l_extendedprice is null "
        "or l_discount is null or l_tax is null or l_quantity is null",
    ) == 0


@pytest.mark.parametrize("sf", SFS)
def test_orders_customer_part_contract(con, sf):
    # q4/agg_cube group-filter on '1-URGENT'; q3 pins the BUILDING
    # segment; q14's promo share needs PROMO-typed parts to be nonzero
    assert _one(
        con,
        f"select count(*) from '{_p(sf, 'orders')}' "
        "where o_orderpriority = '1-URGENT'",
    ) > 0
    lo, hi = con.sql(
        f"select min(o_orderdate), max(o_orderdate) from '{_p(sf, 'orders')}'"
    ).fetchone()
    assert str(lo) <= "1996-01-01" and str(hi) >= "1997-01-01", (lo, hi)
    assert _one(
        con,
        f"select count(*) from '{_p(sf, 'customer')}' "
        "where c_mktsegment = 'BUILDING'",
    ) > 0
    assert _one(
        con,
        f"select count(*) from '{_p(sf, 'part')}' where p_type like 'PROMO%'",
    ) > 0


@pytest.mark.parametrize("sf", SFS)
def test_embeddings_contract(con, sf):
    p = _p(sf, "embeddings")
    # every ANN/dedup/centroid query passes dim=64 as a literal (and
    # the IVF oracle unrolls 64-wide centroid math) — a regenerated
    # dim silently truncates or errors deep inside a kernel
    lo, hi = con.sql(f"select min(len(embedding)), max(len(embedding)) from '{p}'").fetchone()
    assert lo == hi == 64, (lo, hi)
    assert _one(con, f"select count(*) from '{p}' where embedding is null") == 0
    # deterministic ranking tiebreaks (rank by neighbor_id) need
    # unique vec_ids
    assert _one(con, f"select count(*) - count(distinct vec_id) from '{p}'") == 0


@pytest.mark.parametrize("sf", SFS)
def test_documents_contract(con, sf):
    p = _p(sf, "documents")
    # text ops join back on doc_id (dedup groups/survivors, span dedup)
    assert _one(con, f"select count(*) - count(distinct doc_id) from '{p}'") == 0
    # text stats oracles equate n_chars with len(text)
    assert _one(con, f"select count(*) from '{p}' where n_chars <> len(text)") == 0
    # multimodal_resized: char-indexed oracle vs byte-indexed Spark —
    # agreement requires all-ASCII non-empty text (full rationale in
    # test_scale_paths.py::test_documents_fixture_ascii_nonempty)
    assert _one(
        con,
        f"select count(*) from '{p}' where text is null or len(text) = 0 "
        "or len(text) <> strlen(text)",  # strlen = byte length in DuckDB
    ) == 0
    # langid fixture labels: the text_langid_distribution oracle
    # aggregates per label, so the label column must be non-null
    assert _one(con, f"select count(*) from '{p}' where lang is null") == 0
