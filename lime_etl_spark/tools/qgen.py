"""Seeded random query-composition generator for differential testing.

The 139 fixed registry queries prove each operator individually; this
module proves their INTERACTIONS — the one bug class an enumerated
query set cannot see (a window over a full pipeline over a rollup, a
setop under an aggregate, a null-injecting projection feeding a join).
Each seed deterministically generates one pipeline over the star
schema + events/documents, emitting BOTH:

- a Spark DataFrame built through the engine's own operator surface
  (ops.analytics join/group_agg/rollup_agg/cube_agg/running_agg/
  topk_per_group/lag_lead_delta/union_all/intersect/except_rows/
  sort_topn, ops.core.project) — so the generator exercises OUR
  code, not bare pyspark; and
- an equivalent ANSI-SQL string for the DuckDB oracle.

Cross-engine parity is guaranteed BY CONSTRUCTION, not by hoping:

- No floating-point aggregation: SUM over doubles goes through
  CAST(x AS DECIMAL(18,6)) on both sides (order-independent, exact).
  MAGNITUDE CLAUSE (found by tests/test_dialect_contract.py's
  hypothesis sweep, round 8): the engines use DIFFERENT
  double→decimal algorithms — Spark rounds the ≤17-significant-digit
  SHORTEST DECIMAL REPR (BigDecimal.valueOf) HALF_UP, DuckDB rounds
  ``x * 10^scale`` computed in floating point — and neither rounds
  the exact binary expansion. They agree only while
  ``ulp(x)·10^scale`` is far below the rounding-grid spacing, i.e.
  |x| well under ~1e10 for scale 6; at |x| ~ 7e11 all three candidate
  answers differ (pinned by
  test_double_to_decimal_cast_diverges_beyond_contract_bound). This
  generator's casts stay orders of magnitude inside the bound by
  construction: fixture money columns are cent-valued (short reprs,
  |x| < 1e6) and derive arithmetic multiplies by {2.0, 3.0, 0.5}
  literals a bounded number of times. Per-row double arithmetic
  (+,-,*) is IEEE-identical across engines and allowed freely.
- Double literals are rendered with an ``e0`` suffix: BOTH SQL
  dialects type a bare ``1.0`` as DECIMAL (pinned in
  tests/test_dialect_contract.py — an earlier version of this note
  mis-attributed it to DuckDB alone), but the ENGINE side builds
  literals through the DataFrame API where a Python float is a
  DOUBLE; a bare-literal oracle would therefore compute exact decimal
  arithmetic against the engine's IEEE arithmetic. The suffix forces
  the oracle down to DOUBLE to match the engine.
- String concatenation uses ``||`` (NULL-propagating in both engines);
  DuckDB's concat() SKIPS nulls while Spark's returns NULL.
- Every ORDER BY (windows, top-k, sort+limit) is made TOTAL by
  appending the relation's tracked unique-key columns, and the DuckDB
  rendering pins ``ASC NULLS FIRST`` / ``DESC NULLS LAST`` — Spark's
  defaults, not DuckDB's.
- ROLLUP/CUBE oracles carry the engine's standing disclosed deviation
  (registry.py): ``HAVING COUNT(*) > 0`` pins Spark's zero-row
  empty-input form; value-neutral on non-empty input.
- The fixture has no NULLs, so nulls are INJECTED via NULLIF / CASE /
  left-join miss columns and tracked per column; nullable columns are
  excluded from nothing except where NULL semantics would be
  engine-ambiguous (none remain under the rules above).

Every predicate and scalar expression is a single SQL string evaluated
by BOTH engines (Spark via F.expr), so the dialect-shared subset is the
contract: comparisons, IN, AND/OR/NOT, CASE, NULLIF, CAST AS DECIMAL,
upper/lower/substr/length/||, year/month/date_trunc, %, +,-,*.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.io.sources import read_table
from lime_etl_spark.ops import analytics, core

# ---------------------------------------------------------------------------
# Typed catalog (profiled from /root/testdata — TESTDATA.md tables)
# ---------------------------------------------------------------------------

# ltype codes: i32, i64, f64, str, ts, dec


@dataclass(frozen=True)
class Col:
    name: str
    t: str
    nullable: bool = False


@dataclass(frozen=True)
class TableInfo:
    name: str
    cols: tuple[tuple[str, str], ...]  # (name, ltype)
    unique: tuple[str, ...]


TABLES = {
    t.name: t
    for t in [
        TableInfo(
            "lineitem",
            (
                ("l_orderkey", "i64"), ("l_partkey", "i64"), ("l_suppkey", "i64"),
                ("l_linenumber", "i32"), ("l_quantity", "f64"),
                ("l_extendedprice", "f64"), ("l_discount", "f64"), ("l_tax", "f64"),
                ("l_returnflag", "str"), ("l_linestatus", "str"), ("l_shipdate", "ts"),
            ),
            # the fixture's lineitem has NO unique key — (l_orderkey,
            # l_linenumber) collides (4599 distinct of 6000 rows at
            # sf0.001) and even the 4-way key tuple has duplicates;
            # total orders over lineitem use the all-columns tiebreak
            (),
        ),
        TableInfo(
            "orders",
            (
                ("o_orderkey", "i64"), ("o_custkey", "i64"), ("o_orderstatus", "str"),
                ("o_totalprice", "f64"), ("o_orderdate", "ts"),
                ("o_orderpriority", "str"),
            ),
            ("o_orderkey",),
        ),
        TableInfo(
            "customer",
            (
                ("c_custkey", "i64"), ("c_name", "str"), ("c_nationkey", "i32"),
                ("c_acctbal", "f64"), ("c_mktsegment", "str"),
            ),
            ("c_custkey",),
        ),
        TableInfo(
            "part",
            (
                ("p_partkey", "i64"), ("p_name", "str"), ("p_brand", "str"),
                ("p_type", "str"), ("p_size", "i32"), ("p_retailprice", "f64"),
            ),
            ("p_partkey",),
        ),
        TableInfo(
            "supplier",
            (
                ("s_suppkey", "i64"), ("s_name", "str"), ("s_nationkey", "i32"),
                ("s_acctbal", "f64"),
            ),
            ("s_suppkey",),
        ),
        TableInfo(
            "nation",
            (("n_nationkey", "i32"), ("n_name", "str"), ("n_regionkey", "i32")),
            ("n_nationkey",),
        ),
        TableInfo(
            "region",
            (("r_regionkey", "i32"), ("r_name", "str")),
            ("r_regionkey",),
        ),
        TableInfo(
            "events",
            (
                ("event_id", "i64"), ("ts", "ts"), ("user_id", "i64"),
                ("event_type", "str"), ("value", "f64"), ("props", "str"),
            ),
            ("event_id",),
        ),
        TableInfo(
            "documents",
            (
                ("doc_id", "i64"), ("lang", "str"), ("source", "str"),
                ("n_chars", "i64"),
            ),
            ("doc_id",),
        ),
    ]
}

BASE_TABLES = [
    "lineitem", "orders", "customer", "part", "supplier", "events",
    "documents", "nation",
]
BASE_WEIGHTS = [5, 5, 3, 3, 2, 4, 3, 1]

# FK column name -> (dim table, pk column). Names are globally unique
# across the star schema, so name-presence tracking is sound.
FK_MAP = {
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_custkey": ("customer", "c_custkey"),
    "c_nationkey": ("nation", "n_nationkey"),
    "s_nationkey": ("nation", "n_nationkey"),
    "n_regionkey": ("region", "r_regionkey"),
}

# Literal pools per base column (value-domain literals; SQL text form).
# Double literals carry e0 so DuckDB types them DOUBLE, not DECIMAL.
LIT_POOLS: dict[str, list[str]] = {
    "o_totalprice": ["5.0e4", "1.5e5", "2.8e5", "4.0e5"],
    "l_quantity": ["1.0e1", "2.5e1", "4.0e1"],
    "l_discount": ["2.0e-2", "5.0e-2", "8.0e-2"],
    "l_extendedprice": ["2.0e4", "5.0e4", "9.0e4"],
    "l_tax": ["2.0e-2", "5.0e-2"],
    "c_acctbal": ["0.0e0", "2.5e3", "7.5e3"],
    "s_acctbal": ["0.0e0", "5.0e3"],
    "p_retailprice": ["9.05e2", "9.10e2", "9.15e2"],
    "p_size": ["10", "25", "40"],
    "value": ["5.0e1", "1.2e2", "2.5e2"],
    "user_id": ["3", "7", "11"],
    "n_chars": ["100", "250", "400"],
    "l_linenumber": ["2", "4", "6"],
    "n_nationkey": ["5", "12", "18"],
    "c_nationkey": ["5", "12", "18"],
    "s_nationkey": ["5", "12", "18"],
    "n_regionkey": ["1", "2", "3"],
    "r_regionkey": ["1", "2", "3"],
    "o_orderdate": [
        "TIMESTAMP '1996-06-01'", "TIMESTAMP '1998-01-01'",
        "TIMESTAMP '2000-01-01'",
    ],
    "l_shipdate": [
        "TIMESTAMP '1996-09-01'", "TIMESTAMP '1998-06-01'",
        "TIMESTAMP '2000-06-01'",
    ],
    "ts": [
        "TIMESTAMP '2024-01-08'", "TIMESTAMP '2024-01-15'",
        "TIMESTAMP '2024-01-22'",
    ],
    "o_orderstatus": ["'O'", "'F'", "'P'"],
    "o_orderpriority": [
        "'1-URGENT'", "'2-HIGH'", "'3-MEDIUM'", "'4-NOT SPECIFIED'", "'5-LOW'",
    ],
    "c_mktsegment": [
        "'AUTOMOBILE'", "'BUILDING'", "'FURNITURE'", "'HOUSEHOLD'", "'MACHINERY'",
    ],
    "l_returnflag": ["'A'", "'N'", "'R'"],
    "l_linestatus": ["'F'", "'O'"],
    "event_type": ["'click'", "'error'", "'purchase'", "'signup'", "'view'"],
    "p_brand": ["'Brand#1'", "'Brand#7'", "'Brand#13'", "'Brand#19'"],
    "p_type": ["'ECONOMY'", "'LARGE'", "'MEDIUM'", "'PROMO'", "'SMALL'", "'STANDARD'"],
    "lang": ["'de'", "'en'", "'es'", "'fr'", "'zh'"],
    "source": ["'src0'", "'src3'", "'src7'", "'src12'"],
    "r_name": ["'AFRICA'", "'AMERICA'", "'ASIA'", "'EUROPE'", "'MIDDLE EAST'"],
    "event_id": [],  # int keys: modulo predicates only
    "o_orderkey": [], "l_orderkey": [], "l_partkey": [], "l_suppkey": [],
    "c_custkey": [], "o_custkey": [], "p_partkey": [], "s_suppkey": [],
    "doc_id": [],
}

INT_TYPES = {"i32", "i64"}
NUM_TYPES = {"i32", "i64", "f64", "dec"}


# ---------------------------------------------------------------------------
# Relation state threaded through the generated pipeline
# ---------------------------------------------------------------------------


@dataclass
class Rel:
    df: DataFrame
    sql: str
    cols: list[Col]
    # columns whose tuple is unique (total order); None = uniqueness lost
    unique: list[str] | None
    joined: set[str] = field(default_factory=set)
    ops: list[str] = field(default_factory=list)
    # derived-column literal pools (for predicates on derived cols)
    pools: dict[str, list[str]] = field(default_factory=dict)

    def names(self) -> list[str]:
        return [c.name for c in self.cols]

    def col(self, name: str) -> Col:
        for c in self.cols:
            if c.name == name:
                return c
        raise KeyError(name)

    def pool(self, name: str) -> list[str]:
        if name in self.pools:
            return self.pools[name]
        return LIT_POOLS.get(name, [])

    def fks(self) -> dict[str, tuple[str, str]]:
        present = set(self.names())
        return {
            fk: tgt
            for fk, tgt in FK_MAP.items()
            if fk in present and tgt[0] not in self.joined
            and not self.col(fk).nullable
        }


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


class QGen:
    """One seeded pipeline; ``generate()`` returns the final Rel."""

    def __init__(self, seed: int, spark: SparkSession, sf_dir: str):
        self.rng = random.Random(seed)
        self.seed = seed
        self.spark = spark
        self.sf_dir = sf_dir
        self._alias = 0
        self._derived = 0
        self._aggn = 0
        self._branch = 0
        self._renamed = 0

    # -- helpers ------------------------------------------------------------

    def _q(self) -> str:
        self._alias += 1
        return f"q{self._alias}"

    def _d(self) -> str:
        self._derived += 1
        return f"d{self._derived}"

    def _order_sql(self, keys: list[tuple[str, bool]]) -> str:
        # Spark defaults: ASC => NULLS FIRST, DESC => NULLS LAST.
        # DuckDB defaults to NULLS LAST for both — render explicitly.
        return ", ".join(
            f"{k} {'ASC NULLS FIRST' if asc else 'DESC NULLS LAST'}"
            for k, asc in keys
        )

    def _spark_order(self, keys: list[tuple[str, bool]]) -> list:
        return [
            F.col(k).asc_nulls_first() if asc else F.col(k).desc_nulls_last()
            for k, asc in keys
        ]

    def _partition_candidates(self, rel: Rel) -> "list[Col]":
        """Columns usable as window/dedup partition keys: categorical
        strings and small ints, plus un-pooled i64 keys (shared by
        _op_window and _op_keep_latest — one definition, review
        finding)."""
        return [
            c for c in rel.cols
            if c.t in ("str", "i32") or (c.t == "i64" and not rel.pool(c.name))
        ]

    def _tiebreak(self, rel: Rel, exclude: str | None = None) -> list[tuple[str, bool]]:
        """Total-order suffix for deterministic windows/limits.

        The tracked unique tuple when one exists; otherwise ALL current
        columns — rows that tie on every column are identical, so any
        assignment of row numbers / lag neighbors / limit cutoffs among
        them yields the same output MULTISET, which is what the
        order-insensitive compare checks. All column types order
        identically across engines (ASCII strings, exact numerics,
        IEEE doubles, timestamps) with the explicit NULLS rendering.
        """
        names = rel.unique if rel.unique else [c.name for c in rel.cols]
        return [(n, True) for n in names if n != exclude]

    # -- predicate / scalar expression generation ---------------------------

    def _simple_pred(self, rel: Rel) -> str | None:
        cands = [c for c in rel.cols if rel.pool(c.name) or c.t in INT_TYPES]
        if not cands:
            return None
        c = self.rng.choice(cands)
        pool = rel.pool(c.name)
        if not pool and c.t in INT_TYPES:
            m = self.rng.choice([3, 5, 7])
            r = self.rng.randrange(m)
            # modulo predicates are domain-stable across scale factors
            return f"({c.name} % {m}) = {r}"
        if c.t == "str" and len(pool) >= 2 and self.rng.random() < 0.5:
            k = self.rng.randint(2, min(4, len(pool)))
            vals = ", ".join(self.rng.sample(pool, k))
            neg = "NOT " if self.rng.random() < 0.2 else ""
            return f"{c.name} {neg}IN ({vals})"
        op = self.rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{c.name} {op} {self.rng.choice(pool)}"

    def _pred(self, rel: Rel) -> str | None:
        p1 = self._simple_pred(rel)
        if p1 is None:
            return None
        r = self.rng.random()
        if r < 0.35:
            p2 = self._simple_pred(rel)
            if p2 is not None:
                conj = self.rng.choice(["AND", "OR"])
                return f"({p1}) {conj} ({p2})"
        return p1

    def _scalar(self, rel: Rel) -> tuple[str, Col, list[str]] | None:
        """Random derived expression -> (sql_expr, out Col, literal pool)."""
        choices = []
        nums = [c for c in rel.cols if c.t == "f64"]
        ints = [c for c in rel.cols if c.t in INT_TYPES]
        strs = [c for c in rel.cols if c.t == "str"]
        tss = [c for c in rel.cols if c.t == "ts"]
        if nums:
            choices += ["num_arith", "num_case", "dec_cast", "nullif_num"]
        if len(nums) >= 2:
            choices += ["num_diff"]
        if ints:
            choices += ["int_mod"]
        if strs:
            choices += ["str_fn", "nullif_str"]
        if len(strs) >= 2:
            choices += ["str_concat"]
        if tss:
            choices += ["ts_part", "ts_trunc"]
        if not choices:
            return None
        kind = self.rng.choice(choices)
        name = self._d()
        if kind == "num_arith":
            c = self.rng.choice(nums)
            k = self.rng.choice(["2.0e0", "3.0e0", "0.5e0"])
            op = self.rng.choice(["*", "+", "-"])
            return f"({c.name} {op} {k})", Col(name, "f64", c.nullable), []
        if kind == "num_diff":
            a, b = self.rng.sample(nums, 2)
            return (
                f"({a.name} - {b.name})",
                Col(name, "f64", a.nullable or b.nullable),
                [],
            )
        if kind == "num_case":
            c = self.rng.choice(nums)
            pool = rel.pool(c.name)
            if not pool:
                return None
            lit = self.rng.choice(pool)
            hi, lo = "'hi'", "'lo'"
            return (
                f"(CASE WHEN {c.name} > {lit} THEN {hi} ELSE {lo} END)",
                Col(name, "str", c.nullable),
                [hi, lo],
            )
        if kind == "dec_cast":
            c = self.rng.choice(nums)
            return (
                f"CAST({c.name} AS DECIMAL(18,6))",
                Col(name, "dec", c.nullable),
                [],
            )
        if kind == "nullif_num":
            c = self.rng.choice(nums)
            pool = rel.pool(c.name)
            lit = self.rng.choice(pool) if pool else "0.0e0"
            return f"NULLIF({c.name}, {lit})", Col(name, "f64", True), pool
        if kind == "nullif_str":
            c = self.rng.choice(strs)
            pool = rel.pool(c.name)
            if not pool:
                return None
            lit = self.rng.choice(pool)
            return f"NULLIF({c.name}, {lit})", Col(name, "str", True), pool
        if kind == "int_mod":
            c = self.rng.choice(ints)
            m = self.rng.choice([4, 6, 10])
            return (
                f"({c.name} % {m})",
                Col(name, c.t, c.nullable),
                [str(i) for i in range(min(m, 4))],
            )
        if kind == "str_fn":
            c = self.rng.choice(strs)
            fn = self.rng.choice(["upper", "lower", "len", "substr"])
            if fn == "len":
                return f"length({c.name})", Col(name, "i32", c.nullable), []
            if fn == "substr":
                k = self.rng.randint(1, 3)
                return (
                    f"substr({c.name}, 1, {k})",
                    Col(name, "str", c.nullable),
                    [],
                )
            return f"{fn}({c.name})", Col(name, "str", c.nullable), []
        if kind == "str_concat":
            a, b = self.rng.sample(strs, 2)
            return (
                f"({a.name} || '_' || {b.name})",
                Col(name, "str", a.nullable or b.nullable),
                [],
            )
        if kind == "ts_part":
            c = self.rng.choice(tss)
            fn = self.rng.choice(["year", "month"])
            pool = (
                ["1996", "1998", "2000"] if fn == "year" and c.name != "ts"
                else ["1", "4", "8"] if fn == "month"
                else ["2024"]
            )
            return f"{fn}({c.name})", Col(name, "i32", c.nullable), pool
        if kind == "ts_trunc":
            c = self.rng.choice(tss)
            # DuckDB's date_trunc('month', ts) returns DATE; Spark returns
            # TIMESTAMP. The explicit cast is a no-op for Spark and pins
            # DuckDB to the same type.
            return (
                f"CAST(date_trunc('month', {c.name}) AS TIMESTAMP)",
                Col(name, "ts", c.nullable),
                [],
            )
        return None

    # -- op steps -----------------------------------------------------------

    def _base(self) -> Rel:
        tname = self.rng.choices(BASE_TABLES, weights=BASE_WEIGHTS, k=1)[0]
        t = TABLES[tname]
        cols = [Col(n, lt) for n, lt in t.cols]
        df = read_table(self.spark, self.sf_dir, tname)
        df = df.select(*[c.name for c in cols])  # documents: drops text
        sql = f"SELECT {', '.join(c.name for c in cols)} FROM {tname}"
        unique = list(t.unique) if t.unique else None
        return Rel(df, sql, cols, unique, {tname}, [f"base:{tname}"])

    def _op_filter(self, rel: Rel) -> Rel | None:
        pred = self._pred(rel)
        if pred is None:
            return None
        import re as _re

        m = _re.fullmatch(r"(\w+) IN \(([^()]+)\)", pred)
        if m:
            # the reference's F3 whitelist shape — route through the
            # engine op instead of a raw filter
            vals = [v.strip().strip("'") for v in m.group(2).split(",")]
            df = core.filter_isin(rel.df, m.group(1), vals)
        else:
            df = rel.df.filter(F.expr(pred))
        sql = f"SELECT * FROM ({rel.sql}) {self._q()} WHERE {pred}"
        return replace(rel, df=df, sql=sql, ops=rel.ops + ["filter"])

    def _op_dropna(self, rel: Rel) -> Rel | None:
        """core.drop_null_any over injected-null columns — the
        reference's F1/F2 dropna shape, generatively (the fixture has
        no NULLs, so this only fires once NULLIF/CASE/left-join has
        made some column nullable)."""
        nullable = [c.name for c in rel.cols if c.nullable]
        if not nullable:
            return None
        k = self.rng.randint(1, min(2, len(nullable)))
        subset = sorted(self.rng.sample(nullable, k))
        df = core.drop_null_any(rel.df, subset=subset)
        pred = " AND ".join(f"{c} IS NOT NULL" for c in subset)
        sql = f"SELECT * FROM ({rel.sql}) {self._q()} WHERE {pred}"
        return replace(rel, df=df, sql=sql, ops=rel.ops + ["dropna"])

    def _op_rename(self, rel: Rel) -> Rel | None:
        """core.rename (the reference's P4 dict rename) on non-key,
        non-FK columns — name tracking elsewhere is name-based, so
        uniques and FK columns keep their names."""
        keep = set(rel.unique or []) | set(FK_MAP)
        cands = [c for c in rel.cols if c.name not in keep]
        if not cands:
            return None
        k = self.rng.randint(1, min(2, len(cands)))
        chosen = self.rng.sample(cands, k)
        mapping = {}
        for c in chosen:
            self._renamed += 1
            mapping[c.name] = f"rn{self._renamed}_{c.name}"
        df = core.rename(rel.df, mapping)
        proj = ", ".join(
            f"{c.name} AS {mapping[c.name]}" if c.name in mapping else c.name
            for c in rel.cols
        )
        sql = f"SELECT {proj} FROM ({rel.sql}) {self._q()}"
        cols = [
            replace(c, name=mapping.get(c.name, c.name)) for c in rel.cols
        ]
        pools = {mapping.get(k_, k_): v for k_, v in rel.pools.items()}
        # renamed base columns keep their literal pools under the new name
        for c in chosen:
            base_pool = LIT_POOLS.get(c.name)
            if base_pool and mapping[c.name] not in pools:
                pools[mapping[c.name]] = base_pool
        return replace(
            rel, df=df, sql=sql, cols=cols, pools=pools,
            ops=rel.ops + ["rename"],
        )

    def _op_self_outer(self, rel: Rel) -> Rel | None:
        """FULL OUTER join of two filtered branches of the same relation
        on its unique key — the outer-join interaction surface (null
        rows flowing into later filters/aggs/windows from BOTH sides).
        Requires a single-column unique key so the join condition is
        one equality and the output's (key, rkey) tuple stays unique
        (matched: (k,k); left-only: (k,NULL); right-only: (NULL,k))."""
        if not rel.unique or len(rel.unique) != 1:
            return None
        key = rel.unique[0]
        if any(c.name.startswith("r_o_") for c in rel.cols):
            return None  # one self-outer per pipeline
        p1, p2 = self._pred(rel), self._pred(rel)
        if p1 is None or p2 is None or p1 == p2:
            return None
        others = [c for c in rel.cols if c.name != key]
        if not others:
            # a key-only relation (post-project/agg) has nothing to
            # bring from the right branch — randint(1, 0) crashed here
            # (sweep seeds 2040/2481)
            return None
        self.rng.shuffle(others)
        picked = others[: self.rng.randint(1, min(2, len(others)))]
        rmap = {key: f"r_o_{key}", **{c.name: f"r_o_{c.name}" for c in picked}}
        a_df = rel.df.filter(F.expr(p1))
        b_df = rel.df.filter(F.expr(p2)).select(
            *[F.col(n).alias(rmap[n]) for n in [key] + [c.name for c in picked]]
        )
        df = analytics.join(
            a_df, b_df, on=a_df[key] == b_df[rmap[key]], how="full"
        )
        qa, qb = self._q(), self._q()
        rsel = ", ".join(
            f"{n} AS {rmap[n]}" for n in [key] + [c.name for c in picked]
        )
        proj = ", ".join(
            [f"{qa}.{c.name}" for c in rel.cols]
            + [f"{qb}.{rmap[n]}" for n in [key] + [c.name for c in picked]]
        )
        sql = (
            f"SELECT {proj} FROM "
            f"(SELECT * FROM ({rel.sql}) x1 WHERE {p1}) {qa} "
            f"FULL JOIN (SELECT {rsel} FROM ({rel.sql}) x2 WHERE {p2}) {qb} "
            f"ON {qa}.{key} = {qb}.{rmap[key]}"
        )
        # every column is nullable after a full outer join
        cols = [replace(c, nullable=True) for c in rel.cols] + [
            Col(rmap[key], rel.col(key).t, True)
        ] + [Col(rmap[c.name], c.t, True) for c in picked]
        pools = dict(rel.pools)
        for n in [key] + [c.name for c in picked]:
            src = rel.pool(n)
            if src:
                pools[rmap[n]] = src
        return replace(
            rel, df=df, sql=sql, cols=cols,
            unique=[key, rmap[key]], pools=pools,
            ops=rel.ops + ["self_outer"],
        )

    def _op_keep_latest(self, rel: Rel) -> Rel | None:
        """core.dedup_latest — the reference's only window-shaped
        operator (O2: keep-latest per key with a deterministic
        tiebreak), generated with the all-columns tiebreak so the
        row_number order is total and both engines pick the same row."""
        key_cands = self._partition_candidates(rel)
        if not key_cands:
            return None
        key = self.rng.choice(key_cands).name
        oc = self.rng.choice([c for c in rel.cols if c.name != key] or rel.cols)
        ties = [n for n, _ in self._tiebreak(rel) if n not in (key, oc.name)]
        df = core.dedup_latest(rel.df, key, oc.name, tiebreak=ties)
        # dedup_latest orders F.col(c).desc() == DESC NULLS LAST; render
        # through the one helper that owns null-ordering parity
        osql = self._order_sql([(c, False) for c in [oc.name] + ties])
        q, q2 = self._q(), self._q()
        proj = ", ".join(c.name for c in rel.cols)
        sql = (
            f"SELECT {proj} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {key} ORDER BY {osql}) AS __rn "
            f"FROM ({rel.sql}) {q}) {q2} WHERE __rn = 1"
        )
        return replace(
            rel, df=df, sql=sql, unique=[key], ops=rel.ops + ["keep_latest"],
        )

    def _op_derive(self, rel: Rel) -> Rel | None:
        got = self._scalar(rel)
        if got is None:
            return None
        expr, out, pool = got
        df = rel.df.withColumn(out.name, F.expr(expr))
        sql = (
            f"SELECT *, {expr} AS {out.name} FROM ({rel.sql}) {self._q()}"
        )
        pools = dict(rel.pools)
        if pool:
            pools[out.name] = pool
        return replace(
            rel, df=df, sql=sql, cols=rel.cols + [out], pools=pools,
            ops=rel.ops + ["derive"],
        )

    def _op_project(self, rel: Rel) -> Rel | None:
        if rel.unique is None or len(rel.cols) <= 3:
            return None
        keep = set(rel.unique)
        others = [c.name for c in rel.cols if c.name not in keep]
        self.rng.shuffle(others)
        keep.update(others[: self.rng.randint(1, max(1, len(others) - 1))])
        names = [c.name for c in rel.cols if c.name in keep]
        df = core.project(rel.df, names)
        sql = f"SELECT {', '.join(names)} FROM ({rel.sql}) {self._q()}"
        cols = [c for c in rel.cols if c.name in keep]
        return replace(
            rel, df=df, sql=sql, cols=cols, ops=rel.ops + ["project"],
        )

    def _op_join(self, rel: Rel) -> Rel | None:
        fks = rel.fks()
        if not fks or len(rel.joined) > 3:
            return None
        fk = self.rng.choice(sorted(fks))
        dim_name, pk = fks[fk]
        dim = TABLES[dim_name]
        how = self.rng.choices(
            ["inner", "left", "left_semi", "left_anti"],
            weights=[4, 3, 2, 1], k=1,
        )[0]
        q = self._q()
        if how in ("left_semi", "left_anti"):
            exists = "EXISTS" if how == "left_semi" else "NOT EXISTS"
            ddf = read_table(self.spark, self.sf_dir, dim_name).select(pk)
            df = analytics.join(
                rel.df, ddf, on=rel.df[fk] == ddf[pk], how=how,
            )
            sql = (
                f"SELECT * FROM ({rel.sql}) {q} WHERE {exists} "
                f"(SELECT 1 FROM {dim_name} d WHERE d.{pk} = {q}.{fk})"
            )
            return replace(
                rel, df=df, sql=sql, ops=rel.ops + [f"{how}:{dim_name}"],
            )
        # inner/left: bring in 1-3 dim attributes (never the pk — it
        # duplicates the fk); always include the dim's own fk columns so
        # join chains can continue (orders -> customer -> nation -> region).
        attrs = [n for n, _ in dim.cols if n != pk]
        chain_fks = [n for n in attrs if n in FK_MAP]
        extra = [n for n in attrs if n not in FK_MAP]
        self.rng.shuffle(extra)
        picked = chain_fks + extra[: self.rng.randint(1, min(3, len(extra)))]
        picked = list(dict.fromkeys(picked))
        ddf = read_table(self.spark, self.sf_dir, dim_name).select(pk, *picked)
        # join on renamed pk -> single key column, left side's values kept
        ddf_r = ddf.withColumnRenamed(pk, fk)
        salted = how == "inner" and self.rng.random() < 0.3
        if salted:
            # skew-mitigating variant: result must equal the plain join
            # under ANY salt choice — the op's core contract, now
            # exercised generatively (SQL twin stays a plain JOIN)
            df = analytics.salted_join(
                rel.df, ddf_r, key=fk, salt=self.rng.choice([2, 4, 8]),
                how="inner",
            )
        else:
            df = analytics.join(
                rel.df, ddf_r, on=[fk], how=how,
                broadcast_right=self.rng.random() < 0.5,
            )
        jt = "JOIN" if how == "inner" else "LEFT JOIN"
        proj = ", ".join([f"{q}.{c.name}" for c in rel.cols]
                         + [f"d.{n}" for n in picked])
        sql = (
            f"SELECT {proj} FROM ({rel.sql}) {q} {jt} {dim_name} d "
            f"ON {q}.{fk} = d.{pk}"
        )
        nullable = how == "left"
        tdim = dict(dim.cols)
        new_cols = rel.cols + [Col(n, tdim[n], nullable) for n in picked]
        tag = "salted" if salted else how
        return replace(
            rel, df=df, sql=sql, cols=new_cols,
            joined=rel.joined | {dim_name},
            ops=rel.ops + [f"{tag}:{dim_name}"],
        )

    def _op_asof(self, rel: Rel) -> Rel | None:
        """As-of join against a filtered events stream — generative
        coverage for analytics.as_of_join (itself a composition: range
        join + per-left-row row_number). Requires an events-rooted rel
        whose unique tuple is exactly the event id (one output row per
        left row keeps the invariant)."""
        names = set(rel.names())
        if rel.unique != ["event_id"] or not {"user_id", "ts"} <= names:
            return None
        if {"r_ts", "r_eid", "r_val"} & names:  # one as-of per pipeline
            return None
        if rel.col("user_id").nullable or rel.col("ts").nullable:
            return None
        etype = self.rng.choice(
            ["'click'", "'view'", "'purchase'", "'signup'", "'error'"]
        )
        direction = self.rng.choice(["backward", "forward"])
        ev = read_table(self.spark, self.sf_dir, "events")
        right = ev.filter(F.expr(f"event_type = {etype}")).select(
            F.col("user_id"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_eid"),
            F.col("value").alias("r_val"),
        )
        out = analytics.as_of_join(
            rel.df, right, key="user_id", left_ts="ts", right_ts="r_ts",
            left_id="event_id", right_tiebreak="r_eid", direction=direction,
        )
        # the join keeps BOTH user_id columns (left + right key);
        # positional rename then drop disambiguates deterministically
        out = out.toDF(
            *[c.name for c in rel.cols], "__rkey", "r_ts", "r_eid", "r_val"
        ).drop("__rkey")
        q, q2 = self._q(), self._q()
        if direction == "backward":
            cmp_, order = "<=", "r.r_ts DESC NULLS LAST"
        else:
            cmp_, order = ">=", "r.r_ts ASC NULLS FIRST"
        proj = ", ".join(c.name for c in rel.cols)
        sql = (
            f"SELECT {proj}, r_ts, r_eid, r_val FROM ("
            f"SELECT {q}.*, r.r_ts, r.r_eid, r.r_val, "
            f"row_number() OVER (PARTITION BY {q}.event_id "
            f"ORDER BY {order}, r.r_eid DESC NULLS LAST) AS __rn "
            f"FROM ({rel.sql}) {q} LEFT JOIN "
            f"(SELECT user_id AS r_key, ts AS r_ts, event_id AS r_eid, "
            f"value AS r_val FROM events WHERE event_type = {etype}) r "
            f"ON {q}.user_id = r.r_key AND r.r_ts {cmp_} {q}.ts"
            f") {q2} WHERE __rn = 1"
        )
        new_cols = rel.cols + [
            Col("r_ts", "ts", True), Col("r_eid", "i64", True),
            Col("r_val", "f64", True),
        ]
        return replace(
            rel, df=out, sql=sql, cols=new_cols, ops=rel.ops + ["asof"],
        )

    def _agg_exprs(self, rel: Rel) -> tuple[list[str], list[Col]]:
        """1-3 aggregate expressions (SQL text shared by both engines)."""
        out_sql, out_cols = [], []
        n = self.rng.randint(1, 3)
        used_distinct = False
        cands = rel.cols
        for i in range(n):
            # globally unique across the pipeline: a second aggregate
            # over a relation that still carries agg_0 from an earlier
            # aggregate must not collide
            self._aggn += 1
            name = f"agg_{self._aggn}"
            kinds = ["cnt", "min", "max", "sum", "cntcol", "cnt_filter", "bool_agg"]
            if not used_distinct:
                kinds.append("cntd")
            kind = self.rng.choice(kinds)
            if kind == "cnt":
                out_sql.append(f"COUNT(*) AS {name}")
                out_cols.append(Col(name, "i64"))
                continue
            if kind in ("cnt_filter", "bool_agg"):
                pred = self._simple_pred(rel)
                if pred is None:
                    out_sql.append(f"COUNT(*) AS {name}")
                    out_cols.append(Col(name, "i64"))
                    continue
                if kind == "cnt_filter":
                    # the SQL-standard FILTER clause — both engines
                    out_sql.append(f"COUNT(*) FILTER (WHERE {pred}) AS {name}")
                    out_cols.append(Col(name, "i64"))
                else:
                    fn = self.rng.choice(["bool_and", "bool_or"])
                    out_sql.append(f"{fn}({pred}) AS {name}")
                    out_cols.append(Col(name, "bool", True))
                continue
            c = self.rng.choice(cands)
            if kind == "cntcol":
                out_sql.append(f"COUNT({c.name}) AS {name}")
                out_cols.append(Col(name, "i64"))
            elif kind == "cntd":
                used_distinct = True
                out_sql.append(f"COUNT(DISTINCT {c.name}) AS {name}")
                out_cols.append(Col(name, "i64"))
            elif kind in ("min", "max"):
                out_sql.append(f"{kind.upper()}({c.name}) AS {name}")
                out_cols.append(Col(name, c.t, True))
            else:  # sum — never over raw doubles (order-dependent)
                if c.t == "f64":
                    out_sql.append(
                        f"SUM(CAST({c.name} AS DECIMAL(18,6))) AS {name}"
                    )
                    out_cols.append(Col(name, "dec", True))
                elif c.t in INT_TYPES:
                    out_sql.append(f"SUM({c.name}) AS {name}")
                    out_cols.append(Col(name, "i64", True))
                elif c.t == "dec":
                    out_sql.append(f"SUM({c.name}) AS {name}")
                    out_cols.append(Col(name, "dec", True))
                else:
                    out_sql.append(f"COUNT({c.name}) AS {name}")
                    out_cols.append(Col(name, "i64"))
        return out_sql, out_cols

    def _op_agg(self, rel: Rel) -> Rel | None:
        key_cands = [c for c in rel.cols if c.t in ("str", "i32", "ts")]
        nkeys = self.rng.randint(0, min(2, len(key_cands)))
        keys = [c.name for c in self.rng.sample(key_cands, nkeys)] if nkeys else []
        mode = (
            self.rng.choices(["group", "rollup", "cube"], weights=[6, 1, 1], k=1)[0]
            if keys else "group"
        )
        aggs_sql, agg_cols = self._agg_exprs(rel)
        spark_aggs = [
            F.expr(s.rsplit(" AS ", 1)[0]).alias(c.name)
            for s, c in zip(aggs_sql, agg_cols)
        ]
        fn = {"group": analytics.group_agg, "rollup": analytics.rollup_agg,
              "cube": analytics.cube_agg}[mode]
        df = fn(rel.df, keys, spark_aggs)
        q = self._q()
        sel = ", ".join(keys + aggs_sql)
        if mode == "group":
            gb = f" GROUP BY {', '.join(keys)}" if keys else ""
            having = ""
        else:
            gb = f" GROUP BY {mode.upper()} ({', '.join(keys)})"
            # standing disclosed deviation (registry.py): Spark's rollup/
            # cube return ZERO rows on empty input where SQL-standard
            # engines emit the super-aggregate row; value-neutral otherwise
            having = " HAVING COUNT(*) > 0"
        sql = f"SELECT {sel} FROM ({rel.sql}) {q}{gb}{having}"
        key_cols = [replace(rel.col(k)) for k in keys]
        if mode == "group":
            unique = list(keys)
        else:
            unique = None
            key_cols = [replace(c, nullable=True) for c in key_cols]
        pools = {k: rel.pool(k) for k in keys if rel.pool(k)}
        return Rel(
            df, sql, key_cols + agg_cols, unique, set(rel.joined),
            rel.ops + [mode], pools,
        )

    def _op_having_filter(self, rel: Rel) -> Rel | None:
        """Post-agg filter on an aggregate output (HAVING-shaped)."""
        aggs = [c for c in rel.cols if c.name.startswith("agg_") and c.t == "i64"]
        if not aggs:
            return None
        c = self.rng.choice(aggs)
        k = self.rng.choice([1, 2, 5])
        pred = f"{c.name} > {k}"
        df = rel.df.filter(F.expr(pred))
        sql = f"SELECT * FROM ({rel.sql}) {self._q()} WHERE {pred}"
        return replace(rel, df=df, sql=sql, ops=rel.ops + ["having"])

    def _op_window(self, rel: Rel) -> Rel | None:
        pk_cands = self._partition_candidates(rel)
        if not pk_cands:
            return None
        part = self.rng.choice(pk_cands).name
        kinds = ["rank", "dense_rank", "part_sum",
                 "row_number", "topk", "running", "lag",
                 "moving", "ntile", "first_last"]
        kind = self.rng.choice(kinds)
        q = self._q()
        tiebreak = self._tiebreak(rel)
        uniq = [n for n, _ in tiebreak]
        name = self._d()

        if kind in ("rank", "dense_rank"):
            oc = self.rng.choice(rel.cols)
            order = [(oc.name, self.rng.random() < 0.7)]
            osql = self._order_sql(order)
            expr = f"{kind}() OVER (PARTITION BY {part} ORDER BY {osql})"
            df = rel.df.withColumn(name, F.expr(expr))
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, "i32")],
                ops=rel.ops + [kind],
            )

        if kind == "part_sum":
            # whole-partition (unbounded) sum: order-independent, so
            # decimal-cast keeps it exact with NO order-by needed
            nums = [c for c in rel.cols if c.t in NUM_TYPES]
            if not nums:
                return None
            c = self.rng.choice(nums)
            arg = (
                f"CAST({c.name} AS DECIMAL(18,6))" if c.t == "f64" else c.name
            )
            t = "dec" if c.t in ("f64", "dec") else "i64"
            expr = f"SUM({arg}) OVER (PARTITION BY {part})"
            df = rel.df.withColumn(name, F.expr(expr))
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, t, True)],
                ops=rel.ops + ["part_sum"],
            )

        # total-order kinds below need the total tiebreak
        order = tiebreak
        osql = self._order_sql(order)
        if kind == "row_number":
            expr = f"row_number() OVER (PARTITION BY {part} ORDER BY {osql})"
            df = rel.df.withColumn(name, F.expr(expr))
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, "i32")],
                ops=rel.ops + ["row_number"],
            )
        if kind == "topk":
            k = self.rng.randint(1, 4)
            oc = self.rng.choice(rel.cols)
            asc = self.rng.random() < 0.5
            order = [(oc.name, asc)] + self._tiebreak(rel, exclude=oc.name)
            df = analytics.topk_per_group(
                rel.df, [part], self._spark_order(order), k, rank_col=name,
            )
            osql = self._order_sql(order)
            expr = f"row_number() OVER (PARTITION BY {part} ORDER BY {osql})"
            sql = (
                f"SELECT * FROM (SELECT *, {expr} AS {name} "
                f"FROM ({rel.sql}) {q}) {self._q()} WHERE {name} <= {k}"
            )
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, "i32")],
                ops=rel.ops + ["topk"],
            )
        if kind == "running":
            nums = [c for c in rel.cols if c.t in NUM_TYPES]
            if not nums:
                return None
            c = self.rng.choice(nums)
            arg = (
                f"CAST({c.name} AS DECIMAL(18,6))" if c.t == "f64" else c.name
            )
            t = "dec" if c.t in ("f64", "dec") else "i64"
            df = analytics.running_agg(
                rel.df, [part], uniq, F.sum(F.expr(arg)), name,
            )
            expr = (
                f"SUM({arg}) OVER (PARTITION BY {part} ORDER BY {osql} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            )
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, t, True)],
                ops=rel.ops + ["running"],
            )
        if kind == "moving":
            # sliding row frame via the engine's moving_agg — exact
            # decimal, deterministic under the total order
            nums = [c for c in rel.cols if c.t in NUM_TYPES]
            if not nums:
                return None
            c = self.rng.choice(nums)
            arg = (
                f"CAST({c.name} AS DECIMAL(18,6))" if c.t == "f64" else c.name
            )
            t = "dec" if c.t in ("f64", "dec") else "i64"
            prec = self.rng.randint(1, 3)
            folw = self.rng.randint(0, 2)
            df = analytics.moving_agg(
                rel.df, [part], uniq, F.sum(F.expr(arg)), name,
                preceding=prec, following=folw,
            )
            expr = (
                f"SUM({arg}) OVER (PARTITION BY {part} ORDER BY {osql} "
                f"ROWS BETWEEN {prec} PRECEDING AND "
                + (f"{folw} FOLLOWING" if folw else "CURRENT ROW") + ")"
            )
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, t, True)],
                ops=rel.ops + ["moving"],
            )
        if kind == "ntile":
            k = self.rng.choice([2, 3, 4])
            expr = f"ntile({k}) OVER (PARTITION BY {part} ORDER BY {osql})"
            df = rel.df.withColumn(name, F.expr(expr))
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + [Col(name, "i32")],
                ops=rel.ops + ["ntile"],
            )
        if kind == "first_last":
            c = self.rng.choice(rel.cols)
            fn = self.rng.choice(["first_value", "last_value"])
            # explicit frame: last_value's default frame ends at CURRENT
            # ROW (useless and a classic trap) — pin unbounded/current
            # consistently in both engines
            frame = (
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
                if fn == "last_value" or self.rng.random() < 0.5
                else "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
            )
            expr = (
                f"{fn}({c.name}) OVER (PARTITION BY {part} "
                f"ORDER BY {osql} {frame})"
            )
            df = rel.df.withColumn(name, F.expr(expr))
            sql = f"SELECT *, {expr} AS {name} FROM ({rel.sql}) {q}"
            return replace(
                rel, df=df, sql=sql,
                cols=rel.cols + [Col(name, c.t, c.nullable)],
                ops=rel.ops + ["first_last"],
            )
        if kind == "lag":
            nums = [c for c in rel.cols if c.t in NUM_TYPES]
            if not nums:
                return None
            c = self.rng.choice(nums)
            df = analytics.lag_lead_delta(
                rel.df, [part], uniq, c.name, out_prefix=f"{name}_",
            )
            over = f"OVER (PARTITION BY {part} ORDER BY {osql})"
            sql = (
                f"SELECT *, lag({c.name}) {over} AS {name}_prev, "
                f"lead({c.name}) {over} AS {name}_next, "
                f"{c.name} - lag({c.name}) {over} AS {name}_delta "
                f"FROM ({rel.sql}) {q}"
            )
            t = c.t
            dt = "i64" if t in INT_TYPES else t
            new = [
                Col(f"{name}_prev", t, True), Col(f"{name}_next", t, True),
                Col(f"{name}_delta", dt, True),
            ]
            return replace(
                rel, df=df, sql=sql, cols=rel.cols + new,
                ops=rel.ops + ["lag_lead"],
            )
        return None

    def _op_setop(self, rel: Rel) -> Rel | None:
        p1, p2 = self._pred(rel), self._pred(rel)
        if p1 is None or p2 is None or p1 == p2:
            return None
        kind = self.rng.choices(
            ["union_all", "union_distinct", "intersect", "except_all",
             "except_distinct"],
            weights=[3, 2, 2, 1, 1], k=1,
        )[0]
        qa, qb = self._q(), self._q()
        a_df, b_df = rel.df.filter(F.expr(p1)), rel.df.filter(F.expr(p2))
        if kind == "union_all":
            # branch tag keeps the unique-tuple invariant when filters
            # overlap; the name must be pipeline-unique — a second
            # union over a relation already carrying a tag would
            # duplicate the column in SQL while Spark's withColumn
            # silently REPLACES it (seeds 423/827/1890)
            self._branch += 1
            tag = f"branch{self._branch}"
            a_df = a_df.withColumn(tag, F.lit("a"))
            b_df = b_df.withColumn(tag, F.lit("b"))
            df = analytics.union_all(a_df, b_df)
            sql = (
                f"SELECT *, 'a' AS {tag} FROM ({rel.sql}) {qa} WHERE {p1} "
                f"UNION ALL "
                f"SELECT *, 'b' AS {tag} FROM ({rel.sql}) {qb} WHERE {p2}"
            )
            cols = rel.cols + [Col(tag, "str")]
            unique = rel.unique + [tag] if rel.unique is not None else None
            return replace(
                rel, df=df, sql=sql, cols=cols, unique=unique,
                ops=rel.ops + [kind],
            )
        sql_op = {
            "union_distinct": "UNION",
            "intersect": "INTERSECT",
            "except_all": "EXCEPT ALL",
            "except_distinct": "EXCEPT",
        }[kind]
        if kind == "union_distinct":
            df = analytics.union_distinct(a_df, b_df)
            unique = [c.name for c in rel.cols]
        elif kind == "intersect":
            df = analytics.intersect(a_df, b_df)
            unique = [c.name for c in rel.cols]
        elif kind == "except_all":
            df = analytics.except_rows(a_df, b_df, keep_dups=True)
            unique = rel.unique  # A-rows minus B multiset: uniqueness kept
        else:
            df = analytics.except_rows(a_df, b_df, keep_dups=False)
            unique = [c.name for c in rel.cols]
        sql = (
            f"SELECT * FROM ({rel.sql}) {qa} WHERE {p1} "
            f"{sql_op} "
            f"SELECT * FROM ({rel.sql}) {qb} WHERE {p2}"
        )
        return replace(
            rel, df=df, sql=sql, unique=unique, ops=rel.ops + [kind],
        )

    def _op_distinct(self, rel: Rel) -> Rel | None:
        if len(rel.cols) > 6:
            return None
        df = rel.df.distinct()
        sql = f"SELECT DISTINCT * FROM ({rel.sql}) {self._q()}"
        return replace(
            rel, df=df, sql=sql, unique=[c.name for c in rel.cols],
            ops=rel.ops + ["distinct"],
        )

    def _op_sort_limit(self, rel: Rel) -> Rel | None:
        oc = self.rng.choice(rel.cols)
        asc = self.rng.random() < 0.5
        order = [(oc.name, asc)] + self._tiebreak(rel, exclude=oc.name)
        n = self.rng.choice([5, 10, 25, 50])
        df = analytics.sort_topn(rel.df, self._spark_order(order), n)
        sql = (
            f"SELECT * FROM ({rel.sql}) {self._q()} "
            f"ORDER BY {self._order_sql(order)} LIMIT {n}"
        )
        return replace(rel, df=df, sql=sql, ops=rel.ops + ["sort_limit"])

    # -- driver ---------------------------------------------------------------

    OP_MENU = [
        ("filter", 24), ("derive", 20), ("join", 20), ("agg", 14),
        ("window", 12), ("setop", 5), ("distinct", 3), ("project", 4),
        ("having", 4), ("asof", 4), ("dropna", 6), ("rename", 4),
        ("keep_latest", 5), ("self_outer", 4),
    ]

    def generate(self) -> Rel:
        rel = self._base()
        n_ops = self.rng.randint(2, 6)
        names = [n for n, _ in self.OP_MENU]
        weights = [w for _, w in self.OP_MENU]
        fns = {
            "filter": self._op_filter, "derive": self._op_derive,
            "join": self._op_join, "agg": self._op_agg,
            "window": self._op_window, "setop": self._op_setop,
            "distinct": self._op_distinct, "project": self._op_project,
            "having": self._op_having_filter,
            "asof": self._op_asof,
            "dropna": self._op_dropna,
            "rename": self._op_rename,
            "keep_latest": self._op_keep_latest,
            "self_outer": self._op_self_outer,
        }
        applied = 0
        tries = 0
        while applied < n_ops and tries < n_ops * 5:
            tries += 1
            op = self.rng.choices(names, weights=weights, k=1)[0]
            nxt = fns[op](rel)
            if nxt is not None:
                rel = nxt
                applied += 1
        if self.rng.random() < 0.3:
            nxt = self._op_sort_limit(rel)
            if nxt is not None:
                rel = nxt
        return rel


def generate_query(seed: int, spark: SparkSession, sf_dir: str) -> Rel:
    """Deterministic: same seed -> same pipeline (random.Random is
    version-stable, and all candidate enumerations are order-stable)."""
    return QGen(seed, spark, sf_dir).generate()
