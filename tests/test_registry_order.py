"""Export-window invariants: the driver's correctness gate scores the
first 50 entries of queries(), so that window must stay exactly
PRIMARY_QUERIES — 50 entries, every one oracled, covering every
operator category — with rows-only entries exported last."""

from __future__ import annotations

import __spark_entry__ as entrymod
from lime_etl_spark.registry import PRIMARY_QUERIES, REGISTRY, ordered_registry


def test_primary_window_is_50_oracled_queries():
    assert len(PRIMARY_QUERIES) == 50
    assert len(set(PRIMARY_QUERIES)) == 50
    for name in PRIMARY_QUERIES:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, f"{name} has no oracle"


def test_export_order_primary_first_rows_only_last():
    names = list(entrymod.queries())
    assert names[:50] == PRIMARY_QUERIES
    assert set(names) == set(REGISTRY)
    # every export past the window that lacks an oracle sits at the tail
    tail_flags = [REGISTRY[n].oracle is None for n in names[50:]]
    assert tail_flags == sorted(tail_flags)


def test_primary_window_covers_every_category():
    # category := name prefix family; every family registered anywhere
    # must have at least one representative inside the scored window
    def fam(name: str) -> str:
        for p in ("q", "join", "agg", "window", "setop", "sort", "dedup",
                  "events", "streaming", "string", "date", "text", "ann",
                  "embedding", "multimodal", "pivot", "unpivot", "profile",
                  "pipeline", "asof", "range", "split", "sample", "decontam",
                  "pack", "corpus", "collection", "zorder",
                  "cohort", "funnel", "scd2", "graph", "quality", "interval"):
            if name == p or name.startswith(p + "_") or (p == "q" and name[1:2].isdigit()):
                return p
        return name
    families_all = {fam(n) for n in REGISTRY}
    families_primary = {fam(n) for n in PRIMARY_QUERIES}
    # allowed outside the scored window: pipelines are rows-only smoke
    # entries (reference pipelines have golden tests instead); unpivot
    # is gated inside pivot_unpivot_events; split/sample are
    # beyond-survey training-prep extras (oracled + unit-tested, but
    # every SURVEY §2 category outranks them for the 50 scored slots)
    # corpus_filter_decisions composes rules whose families (text,
    # dedup) are already represented inside the window; collection_*
    # is a scalar-function family variant (string/date are in-window)
    assert families_all - families_primary <= {
        "pipeline",
        "unpivot",
        "split",
        "sample",
        "decontam",
        "pack",
        "corpus",
        "collection",
        # behavioral-analytics extras (cohort/funnel/SCD2/PIT): oracled +
        # unit-tested (tests/test_behavior.py); beyond-survey, so SURVEY §2
        # categories keep the scored slots
        "cohort",
        "funnel",
        "scd2",
        # graph centrality extra (integer-exact PageRank): oracled +
        # unit-tested (tests/test_graph.py)
        "graph",
        # constraint-check extra (profile_orders holds the in-window
        # data-quality slot): oracled + unit-tested (tests/test_quality.py)
        "quality",
        # binned interval-overlap join: the joins family is in-window
        # (range_join/asof); this is its beyond-survey overlap variant
        "interval",
        # zorder_key_orders: beyond-survey scale extra (the write path is
        # gated by its own file-range test); window categories outrank it
        "zorder",
    }


def test_oracle_sql_matches_queries_keys():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    for name in PRIMARY_QUERIES:
        assert name in os_


def test_parse_byte_conf_accepts_spark_forms():
    """Round-3 review: `int(str(conf).rstrip("b"))` threw on a
    human-set suffixed form like "128m". The parser must accept every
    common Spark byte-conf spelling and fall back to the default on
    garbage rather than crash a repartition heuristic."""
    from lime_etl_spark.registry import _parse_byte_conf as p

    assert p("134217728") == 134217728
    assert p("134217728b") == 134217728
    assert p("128m") == 128 << 20
    assert p("128mb") == 128 << 20
    assert p("64k") == 64 << 10
    assert p("1g") == 1 << 30
    assert p("1gb") == 1 << 30
    assert p("2t") == 2 << 40
    assert p(" 128M ") == 128 << 20
    assert p(134217728) == 134217728
    assert p("not-a-size") == 134217728
    assert p("not-a-size", default=42) == 42
