"""Curated scalar-function surface (SURVEY.md §2.6 / §2.7).

The reference's scalar vocabulary is two regex cleanups, a strftime, a
base64 decode and JSON parse/serialize (X1-X6). This module pins the
engine's supported scalar surface as thin re-exports grouped by family
— all JVM expressions (codegen-friendly), no Python UDFs. Where the
reference did something driver-side (b64decode, json.loads), the
column-level equivalent lives here.

The point of a curated list (vs "just use pyspark.sql.functions"): the
oracle contract. Everything listed here has DuckDB-equivalent semantics
pinned by registry queries or unit tests; additions should come with
the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- string (X1/X2 family) -------------------------------------------------
lower = F.lower
upper = F.upper
trim = F.trim
length = F.length
substring = F.substring
concat_ws = F.concat_ws
regexp_replace = F.regexp_replace
regexp_extract = F.regexp_extract
split = F.split
lpad = F.lpad
rpad = F.rpad
replace = F.replace


def strip_and_cast_double(col: Column | str, pattern: str) -> Column:
    """X1/X2: regex-strip then tolerant numeric cast (null on malformed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, "").try_cast("double")


# --- date/time (X3/X4 family) ---------------------------------------------
to_timestamp = F.to_timestamp
to_date = F.to_date
date_format = F.date_format
date_trunc = F.date_trunc
year = F.year
month = F.month
dayofmonth = F.dayofmonth
hour = F.hour
unix_timestamp = F.unix_timestamp
unix_micros = F.unix_micros
timestamp_micros = F.timestamp_micros


def audit_timestamp(run_ts: str) -> Column:
    """X3: run-level pinned audit timestamp (never current_timestamp())."""
    return F.lit(run_ts)


# --- binary / encoding (X5 family) -----------------------------------------
encode = F.encode
decode = F.decode
base64 = F.base64
unbase64 = F.unbase64
md5 = F.md5
sha2 = F.sha2
xxhash64 = F.xxhash64
crc32 = F.crc32
octet_length = F.octet_length


def b64_json_payload(col: Column | str) -> Column:
    """X5+X6 composed: the reference's export decode
    (/root/reference/limesurvey.py:125-126) as a column expression:
    base64 → utf-8 string (parse with from_json + a schema next)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c).cast("string")


# --- JSON (X6 family) -------------------------------------------------------
from_json = F.from_json
to_json = F.to_json
get_json_object = F.get_json_object
json_tuple = F.json_tuple
schema_of_json = F.schema_of_json

# --- math / numeric ---------------------------------------------------------
round_ = F.round
floor = F.floor
ceil = F.ceil
abs_ = F.abs
sqrt = F.sqrt
exp = F.exp
log = F.log
pow_ = F.pow
greatest = F.greatest
least = F.least

# --- array / map (embeddings, shingles, multimodal) -------------------------
array = F.array
array_contains = F.array_contains
array_distinct = F.array_distinct
array_size = F.size
explode = F.explode
posexplode = F.posexplode
sequence = F.sequence
slice_ = F.slice
sort_array = F.sort_array
transform = F.transform
filter_ = F.filter
aggregate = F.aggregate
zip_with = F.zip_with
map_keys = F.map_keys
map_values = F.map_values
create_map = F.create_map

# --- conditional / null handling -------------------------------------------
when = F.when
coalesce = F.coalesce
nullif = F.nullif
isnull = F.isnull
nvl = F.nvl

# --- aggregates (exact + sketch) --------------------------------------------
count = F.count
count_distinct = F.countDistinct
approx_count_distinct = F.approx_count_distinct
sum_ = F.sum
avg = F.avg
min_ = F.min
max_ = F.max
stddev_samp = F.stddev_samp
var_samp = F.var_samp
percentile_approx = F.percentile_approx
collect_list = F.collect_list
collect_set = F.collect_set
