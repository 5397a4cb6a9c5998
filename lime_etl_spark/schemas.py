"""Typed schema registry.

The reference has no declared schemas anywhere — column sets exist only
as positional selection lists (/root/reference/lime_survey_nps.py:54)
and an all-varchar(256) warehouse DDL
(/root/reference/lime_survey_nps.py:120-132). Here every source and
output table gets an explicit StructType so contract violations fail at
plan time, not as a KeyError mid-pipeline.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# LimeSurvey export (flattened response rows; FIXTURES.md §1.1)
# ---------------------------------------------------------------------------

# All leaf values in a LimeSurvey export are strings or null
# (/root/reference/limesurvey.py:112-126 decodes base64 JSON of strings).
SURVEY_RESPONSE = T.StructType(
    [
        T.StructField("index", T.StringType()),  # response id from the dict key
        T.StructField("id", T.StringType()),
        T.StructField("submitdate", T.StringType()),
        T.StructField("lastpage", T.StringType()),
        T.StructField("startlanguage", T.StringType()),
        T.StructField("startdate", T.StringType()),
        T.StructField("datestamp", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("q01", T.StringType()),
        T.StructField("q03", T.StringType()),
        T.StructField("q06", T.StringType()),
        T.StructField("q12", T.StringType()),
        T.StructField("q22", T.StringType()),
    ]
)

# Output tables (reference DDLs; kept stringly for landing-mode parity,
# typed columns noted in comments).
NPS_OUTPUT_COLUMNS = [
    "id_answer",
    "date_sent",
    "last_page",
    "language",
    "start_date",
    "last_action_date",
    "nps",  # double after cleaning (lime_survey_nps.py:73)
    "email",
    "cohort",
    "updated_ts",
]

RETURNS_OUTPUT_COLUMNS = [
    "id_answer",
    "date_sent",
    "grade",  # double after cleaning (lime_survey_returns.py:72)
    "email",
    "order_number",
    "return_order_number",
    "language",
    "updated_ts",
    "return_channel",
]

ORDERS_SHIPPED_OUTPUT_COLUMNS = [
    "id_answer",
    "date_sent",
    "grade",  # double after cleaning (lime_survey_orders_shipped.py:74)
    "email",
    "order_number",
    "updated_ts",
]

# ---------------------------------------------------------------------------
# Analytics fixture tables (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# Dimensions small enough to always broadcast in joins at any SF:
# region and nation are FIXED-SIZE (5 / 25 rows at every SF).
# supplier is NOT in this set — it grows linearly with SF (10k rows
# per SF unit, ~1e9 rows at a 100 TB-scale SF), so treating it as
# always-broadcastable would OOM executors; let AQE decide per run.
# Advisory for query authors (checked in doc reviews, not consumed
# programmatically).
BROADCAST_TABLES = {"region", "nation"}
