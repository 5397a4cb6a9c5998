"""Text-analysis operators over the ``documents`` table (north-star set).

The reference's only text processing is two regex cleanups
(/root/reference/lime_survey_nps.py:73, lime_survey_returns.py:72);
this module supplies the text surface a training-data pipeline needs:
tokenization, token/char stats, quality scoring, language ID,
fingerprinting, and shingling (feeding ops/dedup.py).

Everything is built from JVM-side expressions (regexp_extract_all,
higher-order array functions) — no Python UDF in any hot path — and
every function has an exact ANSI-SQL twin used by the DuckDB
correctness oracle (registry.py), so semantics are pinned, not
approximate.

Canonical tokenization: ``regexp_extract_all(lower(text), '[a-z0-9]+')``
— deterministic, engine-portable, no empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lime_etl_spark.plans import auto_broadcast

TOKEN_PATTERN = "[a-z0-9]+"

# Small fixed stopword sets (kept tiny + frozen: they are part of the
# oracle contract, not a linguistics claim).
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Marker words per language for the n-gram-free language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["de", "shi", "bu", "le", "wo"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]  # deterministic tie order


def tokens(col: Column | str) -> Column:
    """Token array — lowercase alnum runs.

    split-on-complement + drop-empties, NOT regexp_extract_all: both
    produce exactly the maximal [a-z0-9] runs (equality property-tested
    in tests), but Spark's regexp_extract_all evaluates ~5x slower than
    split at identical semantics. The DuckDB oracle keeps
    regexp_extract_all — cross-engine agreement is part of the contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


# GPT-2-style pretokenizer, restricted to an RE2-safe subset (no
# lookahead) so the DuckDB oracle runs the IDENTICAL pattern: common
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace. Counting these pieces tracks
# BPE token counts far better than whitespace words (punctuation and
# digits split off), without needing a merges table.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def bpe_like_tokens(col: Column | str) -> Column:
    """Pretokenized pieces under BPE_PRETOKEN_RE (lowercased input) —
    the units a byte-pair encoder would merge within; piece count is
    the standard cheap token-budget estimator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_PRETOKEN_RE), F.lit(0))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_class_count(col: Column | str, keep_pattern: str) -> Column:
    """Count characters matching a class by deleting everything else."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, f"[^{keep_pattern}]", ""))


def stopword_count(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    return F.size(F.filter(tokens(col), lambda t: t.isin(sw)))


def with_text_stats(
    df: DataFrame, text_col: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Per-document stats: tokens, chars, punctuation/digit counts,
    average token length, stopword ratio. All ratios rounded to pin the
    oracle comparison.

    The token array is materialized ONCE as a working column and every
    stat derives from it — inlining `tokens()` into each stat makes
    Catalyst re-split the text per expression (no common-subexpression
    elimination across projection items), measured 5x slower.
    ``toks_col`` lets a composing caller (filter_decisions) hand in an
    already-materialized token column so the split isn't re-done per
    consumer; the column is left in place for the caller to drop.
    """
    reuse = toks_col is not None
    toks = F.col(toks_col or "__toks")
    n_tok = F.size(toks)
    total_tok_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    sw = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    base = df if reuse else df.withColumn("__toks", tokens(text_col))
    out = (
        base
        .withColumns(
            {
                "n_tokens": n_tok,
                "n_chars_obs": F.length(text_col),
                "n_punct": char_class_count(text_col, ".,!?;:"),
                "n_digits": char_class_count(text_col, "0-9"),
                "avg_token_len": F.round(
                    total_tok_len / F.nullif(n_tok.cast("double"), F.lit(0.0)), 4
                ),
                "stopword_ratio": F.round(
                    sw / F.nullif(n_tok.cast("double"), F.lit(0.0)), 4
                ),
            }
        )
    )
    return out if reuse else out.drop("__toks")


def with_quality_score(
    df: DataFrame, text_col: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Heuristic quality score in [0,1] (Gopher-style length/ratio
    gates, simplified): penalize too-short docs, punctuation-free walls
    of text, and stopword-free token soup. Deterministic + oracle-exact.
    ``toks_col``: see with_text_stats.
    """
    stats = with_text_stats(df, text_col, toks_col=toks_col)
    # NOTE: no final round() — the three components are already derived
    # from pinned (rounded) stats, and a trailing round at a .xxxx5
    # boundary is engine-dependent (Spark HALF_UP on decimal expansion
    # vs DuckDB multiply-shift). The raw IEEE double of this fixed-order
    # weighted sum is bit-identical across engines; rounding would make
    # it LESS comparable, not more.
    score = (
        F.when(F.col("n_tokens") < 10, 0.0)
        .otherwise(
            0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
            + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
            + 0.3
            * F.when(
                (F.col("avg_token_len") >= 3.0) & (F.col("avg_token_len") <= 10.0),
                1.0,
            ).otherwise(0.0)
        )
    )
    return stats.withColumn("quality_score", score)


def with_lang_id(
    df: DataFrame, text_col: str = "text", toks_col: str | None = None
) -> DataFrame:
    """Marker-word language ID.

    Counts marker hits per language over the token array and takes the
    argmax with a fixed priority tie order (LANG_PRIORITY). At 100 TB
    this stays a narrow projection — no shuffle, no UDF.
    ``toks_col``: see with_text_stats.
    """
    def _hits(words: list[str]):
        # closure factory: a default-arg lambda would have TWO params,
        # which PySpark's filter() interprets as (element, index)
        return lambda t: t.isin(words)

    # token array materialized once (see with_text_stats docstring)
    reuse = toks_col is not None
    tcol = toks_col or "__toks"
    hit_cols = {
        f"__hits_{lang}": F.size(F.filter(F.col(tcol), _hits(words)))
        for lang, words in LANG_MARKERS.items()
    }
    base = df if reuse else df.withColumn("__toks", tokens(text_col))
    out = base.withColumns(hit_cols)
    best = F.greatest(*[F.col(c) for c in hit_cols])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        pred = pred.when(F.col(f"__hits_{lang}") == best, F.lit(lang))
    out = out.withColumn("lang_pred", pred).drop(*hit_cols.keys())
    return out if reuse else out.drop("__toks")


def _fingerprint_of(toks: Column) -> Column:
    """md5 of the canonical token stream — the ONE fingerprint
    definition (with_fingerprint and filter_decisions both derive from
    it, so the dedup key they share can never silently fork)."""
    return F.md5(F.concat_ws(" ", toks))


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of the canonical token stream.

    Token-stream (not raw-text) hashing makes the fingerprint robust to
    whitespace/case-only differences — the useful notion of "same
    document" for dedup at scale.
    """
    return df.withColumn(out, _fingerprint_of(tokens(text_col)))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingle array from an already-materialized token array column.

    slice() is 1-based; a doc with t tokens yields t-n+1 shingles,
    empty array if t < n. Prefer this in hot paths: pass a token COLUMN
    (computed once) — re-deriving tokens inside each use re-splits the
    text per expression (no CSE across projection items).
    """
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not [],
    # so short docs must short-circuit to an empty array explicitly.
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hashed_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """xxhash64 per n-gram window, skipping string-shingle construction.

    For consumers that only need shingles as join/grouping keys (the
    Jaccard inverted index), building the ``concat_ws`` shingle string
    and hashing it afterwards is pure allocation overhead: hashing the
    n window tokens directly (Spark's XxHash64 folds each argument into
    the running seed, so ("ab","c") and ("a","bc") diverge) yields keys
    with the same distinctness semantics at the same ~1e-10 64-bit
    collision tolerance, minus one string materialization per shingle.
    NOT for MinHash: signatures are pinned to ``_hash28(shingle_string)``
    and mirrored by the DuckDB oracle — changing their input hash would
    silently re-key every persisted band index.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.xxhash64(*[F.element_at(toks, i + k) for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingle array straight from a text column.

    Convenience form; feeds MinHash/Jaccard dedup (ops/dedup.py) — the
    dedup pipelines use shingles_from_tokens over a materialized token
    column instead (one tokenization pass).
    """
    return shingles_from_tokens(tokens(col), n)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style repetition quality metrics per document:

    - ``dup_3gram_frac``: fraction of 3-gram shingles that are repeats
      (1 - distinct/total) — high values mean boilerplate/looping text;
    - ``top_bigram``/``top_bigram_n``/``top_bigram_frac``: the most
      frequent bigram and its share of all bigrams (ties broken by
      lexicographically smallest bigram — deterministic).

    The 3-gram part is a narrow projection (array ops per row, no
    shuffle). The top-bigram mode NEEDS a per-(doc,bigram) count; that
    is explode + two doc-keyed aggregations — linear in corpus size —
    rather than the per-row quadratic ``transform(distinct, count)``
    array expression, which degrades as doc_len² on real documents.
    Docs with < 2 tokens surface zero counts and '' (no bigrams).
    """
    base = df.select(F.col(id_col).alias("doc_id"), text_col).withColumn(
        "__toks", tokens(text_col)
    )
    sh3 = shingles_from_tokens(F.col("__toks"), 3)
    n3 = F.size(sh3)
    u3 = F.size(F.array_distinct(sh3))
    tri = base.select(
        "doc_id",
        n3.cast("bigint").alias("n_3grams"),
        u3.cast("bigint").alias("n_uniq_3grams"),
        F.when(n3 > 0, F.round(F.lit(1.0) - u3 / n3.cast("double"), 6))
        .otherwise(0.0)
        .alias("dup_3gram_frac"),
        F.greatest(F.size(F.col("__toks")) - 1, F.lit(0))
        .cast("bigint")
        .alias("n_bigrams"),
    )
    bi = base.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("__toks"), 2)).alias("bigram")
    )
    counts = bi.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("bigram").asc())
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("bigram").alias("top_bigram"), F.col("n").alias("top_bigram_n"))
    )
    return (
        tri.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_3grams",
            "n_uniq_3grams",
            "dup_3gram_frac",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("bigint").alias("top_bigram_n"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(
                    F.coalesce("top_bigram_n", F.lit(0))
                    / F.col("n_bigrams").cast("double"),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("top_bigram_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k most distinctive terms per document by TF-IDF.

    IDF is the RATIONAL form N/df (not ln(N/df)): the ranking is
    identical (ln is monotone) and integer-ratio doubles are
    bit-reproducible across engines, while libm ln() may differ in the
    last ulp between the JVM and DuckDB — a correctness-gate hazard the
    engine's design rules out by construction (registry.py docstring).

    Plan: one explode + (doc,term) count [tf]; doc frequency is then
    derived FROM tf — tf has exactly one row per (doc, term), so
    ``tf.groupBy(term).count()`` IS the number of documents containing
    the term (round 10, second pass: the old separate
    explode(array_distinct)+groupBy(term) leg was a second full
    tokenization pass over the corpus; deriving df from tf makes the
    two references to tf byte-identical subtrees shuffling on the same
    keys, so the exchange is planned once and runtime-reused — one
    tokenize pass, and the df-side shuffle now moves per-(doc,term)
    partial counts it was moving anyway). Broadcast the df table's
    join? No — df is per-term over the whole corpus and can be wide;
    both aggregations shuffle on term/doc keys with map-side partial
    aggregation, then the per-doc top-k is a window row_number (no
    global sort). N (corpus size) is a driver scalar — one count job,
    the same pattern as any threshold constant.
    """
    base = df.select(F.col(id_col).alias("doc_id"), text_col).withColumn(
        "__toks", tokens(text_col)
    )
    n = n_docs if n_docs is not None else base.count()
    tok = base.select("doc_id", F.explode("__toks").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # count(when(tf > 0, 1)), not count(1): tf >= 1 always, so the
    # value is identical (docs where the term occurs) — but the
    # predicate makes this branch depend on tf's VALUE, which stops
    # the optimizer from (a) rewriting count(tf)→count(1) (tf is
    # provably non-null) and then (b) pruning tf out of the child,
    # turning it into a bare DISTINCT (functions=[]) — that rewrite
    # made the two tf subtrees non-identical and silently disabled the
    # exchange reuse this single-pass shape exists for (verified in
    # the executed plan both ways).
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("doc_freq")
    )
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round((F.col("tf") * F.lit(n)).cast("double") / F.col("doc_freq"), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
    )


def filter_decisions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 500,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """The end-to-end per-document filter verdict a training pipeline
    ships: every document with its gating stats, a keep flag, and the
    FIRST failing rule in a fixed priority order (exact_dup >
    too_short > too_long > low_quality > lang) — so drop reasons are
    deterministic and auditable, not an unordered rule soup.

    Composes the quality score, language ID, and exact-dup canonical
    selection (fingerprint window min — duplicates lose to the lowest
    doc_id). One shuffle total (the fingerprint window); stats, score,
    lang, and the rule cascade are all narrow JVM expressions. The
    comparison against ``min_quality`` is engine-safe because the
    score itself is bit-reproducible (see with_quality_score).

    Null text is normalized to '' FIRST: otherwise n_tokens is NULL,
    every rule comparison is NULL, the cascade falls through to 'keep',
    and least() (which skips NULL args) manufactures a nonzero quality
    score — a null-text doc would sail through the filter. As empty
    text it dedups/fails-short like any other empty doc.

    The token array is split ONCE and shared by all three consumers
    (stats, lang ID, fingerprint) via their ``toks_col`` hooks — the
    module's materialize-tokens-once rule; inlining tokens() per
    consumer re-split the text three times per row.
    """
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    df = df.withColumn("__toks", tokens(text_col))
    scored = with_lang_id(
        with_quality_score(df, text_col, toks_col="__toks"),
        text_col,
        toks_col="__toks",
    )
    w = Window.partitionBy("__fp")
    out = scored.withColumn(
        "__fp", _fingerprint_of(F.col("__toks"))
    ).withColumn("__canon", F.min(id_col).over(w))
    is_dup = F.col(id_col) != F.col("__canon")
    reason = (
        F.when(is_dup, "exact_dup")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .when(~F.col("lang_pred").isin(*langs), "lang")
        .otherwise("keep")
    )
    return out.select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("quality_score"),
        F.col("lang_pred"),
        is_dup.alias("is_exact_dup"),
        reason.alias("drop_reason"),
        (reason == F.lit("keep")).alias("keep"),
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 5,
) -> DataFrame:
    """C4-style corpus-level duplicate-span removal.

    The corpus is cut into non-overlapping ``span``-token spans (the
    last span of a doc may be shorter); any span whose exact token
    sequence occurs more than once in the corpus keeps ONLY its first
    occurrence (ordered by doc_id, then position — a total order both
    engines agree on) and every other occurrence is deleted. This is
    the C4 paper's dedup rule (three-sentence spans there; token spans
    here — the synthetic corpus has no sentence boundaries) and the
    standard boilerplate-removal pass before training.

    Returns (doc_id, n_spans, n_kept, text_deduped) with the text
    rebuilt from surviving spans in original order. Docs with zero
    tokens have no spans and are absent (mirrored by the oracle).

    Scale shape: two shuffles, both linear in corpus size — one on the
    span key (the global first-occurrence window; same cost class as
    any exact global dedup) and one on doc_id for reassembly. The
    per-doc collect_list is bounded by document length (reassembly is
    inherently per-doc). No UDF, no driver collection.
    """
    base = df.select(F.col(id_col).alias("doc_id"), text_col).withColumn(
        "__toks", tokens(text_col)
    )
    n_tok = F.size("__toks")
    # guard: sequence(0, -1) would yield a DESCENDING [0, -1], not []
    spans_col = F.when(
        n_tok > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(n_tok / F.lit(span)).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i * span + 1, span)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select("doc_id", F.posexplode(spans_col).alias("pos", "span"))
    w = Window.partitionBy("span").orderBy("doc_id", "pos")
    ranked = ex.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(F.col("__rn") == 1, F.struct("pos", "span"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["span"]
            ),
        ).alias("text_deduped"),
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", width: int = 10
) -> DataFrame:
    """Corpus token-length distribution: histogram of per-doc token
    counts in fixed-width buckets, with each bucket's share of the
    corpus — the standard first look at a training corpus (and the
    input to length-based filtering decisions).

    One map-side-combined groupBy on the bucket (low-cardinality key);
    the share is a window sum over the tiny aggregated result, not a
    second pass over the corpus. Null text counts as 0 tokens (a NULL
    bucket row would otherwise leak into the report).
    """
    b = (
        F.floor(token_count(F.coalesce(F.col(text_col), F.lit(""))) / F.lit(width))
        * width
    ).cast("bigint")
    agg = df.select(b.alias("bucket_lo")).groupBy("bucket_lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.withColumn(
        "share", F.round(F.col("n_docs") / total.cast("double"), 6)
    )


# ---------------------------------------------------------------------------
# Redaction + vocabulary (training-data preparation)
# ---------------------------------------------------------------------------

# Deliberately simple, engine-portable patterns (no lookaround, no
# backreferences — the intersection of Java regex and RE2 semantics).
REDACT_PATTERNS: dict[str, str] = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "url": "https?://[^ ]+",
    "number_long": "[0-9]{7,}",
}


def redact(df: DataFrame, text_col: str = "text", out: str = "text_redacted") -> DataFrame:
    """Replace emails, URLs, and long digit runs with typed placeholder
    tokens — the standard pre-training scrub. Chained JVM
    regexp_replace, one narrow pass, no shuffle; patterns restricted to
    the Java-regex/RE2 common subset so the DuckDB twin is exact."""
    c = F.col(text_col)
    for kind, pat in REDACT_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return df.withColumn(out, c)


def vocabulary(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Corpus vocabulary: token -> (term frequency, document frequency),
    top_k by frequency. The canonical word-count: per-row distinct for
    df, explode, one map-side-combined groupBy; the top-k is a
    TakeOrdered, not a global sort. At 100 TB this is one shuffle of
    partially-aggregated (token, counts) pairs."""
    toks = df.select(tokens(text_col).alias("__toks"))
    tf = (
        toks.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    dfreq = (
        toks.select(F.explode(F.array_distinct(F.col("__toks"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    joined = tf.join(dfreq, "token")
    return (
        joined.orderBy(F.col("term_freq").desc(), F.col("token").asc()).limit(top_k)
    )


def pair_with(toks: Column) -> Column:
    """Adjacent-pair array from a token array: zip_with over
    (toks[:-1], toks[1:]) as 'left right' strings; < 2 tokens yields an
    empty array (slice with length ≤ 0). Codegen CSE dedups the
    repeated size()."""
    head = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.zip_with(head, tail, lambda x, y: F.concat(x, F.lit(" "), y))


def bigrams(col: Column | str) -> Column:
    """Adjacent-token bigram array from the standard tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return pair_with(tokens(c))


def collocations(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Top collocations (adjacent-token pairs) by PMI ratio —
    P(x,y) / (P(x)·P(y)) = n_xy·N / (n_x·n_y) — the tokenizer-building
    view of a corpus (which word pairs behave as units). The ratio, not
    its log, is reported: every factor is an exact count and the
    expression is evaluated double-cast in the identical op order on
    both engines, so values hash-compare bit-for-bit with NO libm
    (log) cross-engine divergence in the gate.

    Scale shape: one explode+groupBy for unigrams, one for bigrams
    (map-side combined), two keyed joins of bigram rows against the
    (much smaller) unigram table, a single-row total broadcast, and a
    TakeOrdered top-k — no global sort, nothing quadratic. min_count
    prunes the bigram tail BEFORE the joins.
    """
    base = df.select(tokens(text_col).alias("__t"))
    uni = (
        base.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    total = uni.agg(F.sum("n_tok").cast("bigint").alias("n_total"))
    bi = (
        base.select(F.explode(pair_with(F.col("__t"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
        .withColumn("left", F.split("bigram", " ")[0])
        .withColumn("right", F.split("bigram", " ")[1])
    )
    joined = (
        bi.join(uni.select(F.col("tok").alias("left"), F.col("n_tok").alias("n_left")), "left")
        .join(uni.select(F.col("tok").alias("right"), F.col("n_tok").alias("n_right")), "right")
        .crossJoin(auto_broadcast(total, bounded=True))  # 1-row token total
    )
    # double-cast BEFORE multiplying: n_pair*N in int64 overflows at
    # web-corpus scale (N² term); double is exact for counts < 2^53 and
    # the two-multiply-one-divide order is pinned on both engines
    ratio = (
        F.col("n_pair").cast("double") * F.col("n_total").cast("double")
    ) / (F.col("n_left").cast("double") * F.col("n_right").cast("double"))
    return (
        joined.select(
            "bigram",
            "n_pair",
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
            ratio.alias("pmi_ratio"),
        )
        .orderBy(F.col("pmi_ratio").desc(), F.col("bigram").asc())
        .limit(top_k)
    )
