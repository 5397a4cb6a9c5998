"""Source readers.

Covers the reference's source surface (SURVEY.md §2.1) re-expressed as
Spark scans:

- S3 JSON file scan (pandas.read_json, /root/reference/lime_survey_nps.py:48)
  → ``read_survey_export_json`` (explode of the nested payload replaces
  the O(n²) transpose+append flatten loop at lime_survey_nps.py:50-53).
- S4 TSV scan with header on the SECOND line
  (/root/reference/limesurvey.py:151-164, the "Esto no funciona!" one)
  → ``read_tsv_header_line2`` — fixed and distributed.
- Parquet testdata tables (TESTDATA.md) → ``read_table`` / ``load_tables``.

Scale notes: all readers are plain ``spark.read`` scans, so predicate
pushdown / column pruning / partition pruning apply untouched. Schemas
are always supplied — schema inference is a full extra pass over 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark import schemas

# ---------------------------------------------------------------------------
# Parquet fixture tables
# ---------------------------------------------------------------------------


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its registered schema asserted.

    The explicit schema makes contract drift a plan-time error and keeps
    the vectorized parquet reader on the fast path.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Fixture timestamps are wall-clock values compared against DuckDB's
    # naive TIMESTAMP; the session TZ is pinned to UTC, so load them as
    # plain TIMESTAMP (LTZ) rather than letting Spark 4 infer
    # TIMESTAMP_NTZ from isAdjustedToUTC=false parquet annotations —
    # NTZ is rejected by instant functions (unix_micros & co) and the
    # two types render identically under UTC.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    expected = schemas.TESTDATA_TABLES.get(name)
    if expected is not None:
        for field in expected.fields:
            if field.dataType.typeName() != "timestamp":
                continue
            actual = dict(df.dtypes).get(field.name)
            if actual == "bigint":
                # Parquet TIMESTAMP(NANOS) under nanosAsLong: nano-epoch
                # longs (Spark has no nanos type); truncate to micros —
                # lossless for this fixture (values are micro-precision).
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
                )
            elif actual == "timestamp_ntz":
                # Belt-and-braces if NTZ inference was re-enabled on the
                # session: wall clock == instant under the UTC pin.
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
        missing = set(expected.fieldNames()) - set(df.columns)
        if missing:
            raise ValueError(f"table {name} at {path} missing columns {sorted(missing)}")
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once; all if no names given."""
    names = names or tuple(schemas.TESTDATA_TABLES)
    return {n: read_table(spark, sf_dir, n) for n in names}


def read_evolved_parquet(
    spark: SparkSession, path: str, required: "list[str] | None" = None
) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a warehouse
    table that gains fields release by release).

    ``mergeSchema`` reconciles the union of all file footers — files
    missing a newer column surface NULLs for it, so downstream code
    sees one stable wide schema. Schema merging reads every footer at
    planning time: at 100 TB-scale file counts pin the merged schema in
    a metastore/schema registry instead and pass it explicitly — this
    reader is for the evolution WINDOW (backfills, rolling writers),
    not a substitute for schema governance. ``required`` asserts the
    columns the caller depends on survived the merge (a rename, unlike
    an addition, is a contract break and should fail loudly here, not
    as NULLs downstream).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    missing = set(required or []) - set(df.columns)
    if missing:
        raise ValueError(f"evolved read at {path} missing columns {sorted(missing)}")
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV scan (K2's inverse). Always pass a schema in production —
    inference is a full extra pass. PERMISSIVE never fails a 100 TB
    load, but with a plain schema malformed fields are silently
    NULLED; pass ``keep_corrupt=True`` (requires a string schema) to
    append a ``_corrupt_record`` column that carries each malformed
    line verbatim, the same quarantine pattern as
    read_documents_jsonl — the old docstring promised that visibility
    without the schema column that makes Spark provide it."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
    )
    if keep_corrupt:
        if not isinstance(schema, str):
            raise ValueError("keep_corrupt=True needs a string DDL schema")
        # Appending the quarantine column to a schema that already
        # declares it would surface as a duplicate-column
        # AnalysisException deep inside the reader, far from this call
        # site — name the conflict here instead. Match parsed COLUMN
        # NAMES, not a substring of the DDL (a column merely CONTAINING
        # '_corrupt_record', e.g. raw_corrupt_record, is fine).
        try:
            from pyspark.sql.types import StructType

            declared = {f.name for f in StructType.fromDDL(schema).fields}
        except Exception:
            # unparseable DDL fails in the reader anyway; fall back to
            # the conservative substring probe here
            declared = {"_corrupt_record"} if "_corrupt_record" in schema else set()
        if "_corrupt_record" in declared:
            raise ValueError(
                "keep_corrupt=True appends a _corrupt_record column, but "
                "the supplied schema already declares one — drop it from "
                "the schema (the reader adds it) or pass keep_corrupt=False"
            )
        reader = reader.schema(schema + ", _corrupt_record STRING").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    elif schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


DOCUMENTS_JSONL_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Read a JSON-lines corpus dump (one document object per line — the
    standard interchange format for crawled text corpora).

    Line-delimited mode (NOT multiLine) keeps files splittable: a 100 TB
    dump parallelizes by byte range, while a multiLine document pins
    each file to one task. The explicit schema (default: the
    ``documents`` table contract) skips inference's full extra pass and
    keeps width constant; unknown keys are simply not projected.

    PERMISSIVE + ``_corrupt_record`` surfaces malformed lines as rows
    instead of failing the load; ``strict=True`` counts them and raises
    (a corrupt dump should fail loudly, matching
    ``read_survey_export_json``). Callers who want to *quarantine* bad
    lines filter on ``_corrupt_record IS NOT NULL`` before dropping it.
    """
    full = (schema or DOCUMENTS_JSONL_SCHEMA) + ", _corrupt_record STRING"
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if strict:
        raw = raw.cache()
        bad = raw.filter(F.col("_corrupt_record").isNotNull()).count()
        if bad:
            raw.unpersist()
            raise ValueError(f"jsonl corpus at {path}: {bad} corrupt line(s)")
        raw.unpersist()
    return raw


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (Hive-ecosystem interchange). An explicit schema skips footer
    inference on wide directories."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed managed table: joins/aggs on the bucket key
    skip their shuffle entirely (co-located partitioning survives in the
    catalog). This is the 100 TB answer to repeated fact-fact joins on
    one key — pay the shuffle once at write, never at read."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


# ---------------------------------------------------------------------------
# LimeSurvey export payload (nested JSON) — replaces the flatten loop
# ---------------------------------------------------------------------------


# Explicit read schema: without it, Spark's JSON inference fans the
# single-key response maps out into one struct field PER RESPONSE ID —
# schema width O(row count), catastrophic at scale. Arbitrary-key JSON
# objects must be read as MapType.
_EXPORT_SCHEMA = "responses ARRAY<MAP<STRING, MAP<STRING, STRING>>>"


def flatten_responses(raw: DataFrame, field_names: list[str] | None = None) -> DataFrame:
    """Flatten ``{"responses": [{"<respId>": {field: val}}, ...]}``.

    Replaces the reference's per-row ``DataFrame(...).transpose()`` +
    ``df.append`` loop (/root/reference/lime_survey_nps.py:50-53, O(n²))
    with two distributed explodes: array → single-key map → (key, fields).
    The response id (the map key) lands in the ``index`` column, matching
    the reference's ``reset_index(drop=False)`` (lime_survey_nps.py:51).
    """
    if field_names is None:
        field_names = [f.name for f in schemas.SURVEY_RESPONSE.fields if f.name != "index"]
    exploded = raw.select(F.explode("responses").alias("resp"))
    entry = exploded.select(F.explode("resp").alias("index", "fields"))
    return entry.select(
        F.col("index").cast("string"),
        *[F.col("fields").getItem(name).alias(name) for name in field_names],
    )


def read_survey_export_json(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """Read a raw LimeSurvey export JSON file and flatten it.

    ``multiLine=True`` because the export is one JSON document, not
    JSON-lines (the reference json.dump's a single object,
    lime_survey_nps.py:45-46). The explicit map schema keeps schema
    width constant regardless of row count.

    PERMISSIVE mode silently yields zero rows for a corrupt document;
    ``strict=True`` captures ``_corrupt_record`` and raises instead —
    a malformed nightly export should fail the job loudly, not load an
    empty table over yesterday's data.
    """
    schema = _EXPORT_SCHEMA + ", _corrupt_record STRING"
    raw = (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if strict:
        # cache before the dual pass: Spark forbids filtering only on
        # the corrupt-record column of an uncached JSON relation
        raw = raw.cache()
        bad = raw.filter(F.col("_corrupt_record").isNotNull()).count()
        if bad:
            raw.unpersist()
            raise ValueError(
                f"survey export at {path}: {bad} corrupt JSON document(s)"
            )
        raw.unpersist()
    return flatten_responses(raw.drop("_corrupt_record"))


def responses_payload_to_df(spark: SparkSession, payload: dict) -> DataFrame:
    """Build a flattened DataFrame directly from a decoded RPC payload.

    Used by the RPC source (io/limesurvey.py): the driver fetches pages
    of the export, each page becomes a small JSON dataset distributed to
    executors — no intermediate local file, unlike the reference's
    land-raw-then-reload step (lime_survey_nps.py:45-48).
    """
    import json

    raw = spark.createDataFrame([{"payload": json.dumps(payload)}]).select(
        F.from_json("payload", f"STRUCT<{_EXPORT_SCHEMA}>").alias("doc")
    ).select("doc.responses")
    return flatten_responses(raw)


# ---------------------------------------------------------------------------
# TSV with header on line 2 (reference's broken importer, fixed)
# ---------------------------------------------------------------------------


def read_tsv_header_line2(spark: SparkSession, path: str) -> DataFrame:
    """TSV whose first line is junk, second line is the header.

    The reference reads ``datos[1]`` as the header and data from
    ``datos[2:]`` and injects an empty ``id`` column
    (/root/reference/limesurvey.py:159-163) — and is marked broken.
    Here: grab the header from line 2 on the driver (O(1) — first file
    block only), then drop the two physical header lines by line number.
    zipWithIndex is the one justified RDD use in the repo: physical line
    position is inherently imperative and Catalyst has no notion of it.
    """
    lines = spark.read.text(path)
    first_two = [r.value for r in lines.limit(2).collect()]
    if len(first_two) < 2:
        raise ValueError(f"TSV at {path} has no header line 2")
    header = first_two[1].split("\t")
    numbered = lines.rdd.zipWithIndex().filter(lambda t: t[1] >= 2).map(lambda t: t[0])
    data = lines.sparkSession.createDataFrame(numbered, lines.schema).select(
        F.split("value", "\t").alias("parts")
    )
    cols = [F.col("parts").getItem(i).alias(name) for i, name in enumerate(header)]
    # the empty-id injection OVERWRITES a real 'id' header column too —
    # deliberate parity with the reference's r['id'] = "" dict
    # assignment after the zip (limesurvey.py:161), which clobbers any
    # zipped 'id' the same way
    return data.select(*cols).withColumn("id", F.lit(""))
