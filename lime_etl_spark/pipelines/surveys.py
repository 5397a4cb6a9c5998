"""Declarative recreations of the reference's three ETL pipelines.

Each pipeline is a pure DataFrame→DataFrame transform chain; extract and
load are composed around it by the caller (tests use local fixtures, a
deployment would use io.limesurvey + io.sinks). Per-script semantic
quirks are preserved exactly and cited (SURVEY.md §3).

All three are narrow-only except orders_shipped's dedup window
(one shuffle on order_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lime_etl_spark.ops import core

NPS_RENAME = {
    # /root/reference/lime_survey_nps.py:57-68
    "index": "id_answer",
    "submitdate": "date_sent",
    "lastpage": "last_page",
    "startlanguage": "language",
    "startdate": "start_date",
    "datestamp": "last_action_date",
    "q01": "nps",
    "q03": "email",
    "q06": "cohort",
}

RETURNS_RENAME = {
    # /root/reference/lime_survey_returns.py:60-70 — note the returns
    # script maps datestamp→date_sent directly (no submitdate column at
    # all, unlike nps)
    "id": "id_answer",
    "datestamp": "date_sent",
    "startlanguage": "language",
    "q01": "grade",
    "q03": "email",
    "q06": "order_number",
    "q12": "return_channel",
    "q22": "return_order_number",
}

ORDERS_RENAME = {
    # /root/reference/lime_survey_orders_shipped.py:60-66
    "id": "id_answer",
    "datestamp": "date_sent",
    "q01": "grade",
    "q03": "email",
    "q06": "order_number",
}

GRADE_WHITELIST = ["A1", "A2", "A3", "A4", "A5"]  # lime_survey_orders_shipped.py:73


def nps(flat: DataFrame, run_ts: str) -> DataFrame:
    """NPS pipeline (/root/reference/lime_survey_nps.py:48-73).

    project 9 cols (:54) → rename (:57-68) → audit ts (:69) →
    dropna subset [email, nps] (:70) → regex "A|N" strip + cast (:73).
    """
    df = core.project(
        flat,
        ["index", "submitdate", "lastpage", "startlanguage", "startdate", "datestamp", "q01", "q03", "q06"],
    )
    df = core.rename(df, NPS_RENAME)
    df = core.with_audit_ts(df, run_ts)
    df = core.drop_null_any(df, subset=["email", "nps"])
    df = core.clean_numeric(df, "nps", "A|N")
    return df.select(
        "id_answer", "date_sent", "last_page", "language", "start_date",
        "last_action_date", "nps", "email", "cohort", "updated_ts",
    )


def returns(flat: DataFrame, run_ts: str) -> DataFrame:
    """Returns pipeline (/root/reference/lime_survey_returns.py:49-73).

    project (:55-57, id from payload's own `id` field) → rename (:60-70)
    → audit ts (:71) → dropna ALL columns (:58 ordering quirk preserved:
    reference drops nulls BEFORE rename on the 8 projected cols) →
    literal "A" strip + cast (:72) → final reorder (:73).
    """
    df = core.project(
        flat,
        ["id", "datestamp", "q01", "q03", "q06", "q12", "q22", "startlanguage"],
    )
    df = core.drop_null_any(df)  # all-column dropna, lime_survey_returns.py:58
    df = core.rename(df, RETURNS_RENAME)
    df = core.with_audit_ts(df, run_ts)
    df = core.clean_numeric(df, "grade", "A")
    return df.select(
        "id_answer", "date_sent", "grade", "email", "order_number",
        "return_order_number", "language", "updated_ts", "return_channel",
    )


def orders_shipped(flat: DataFrame, run_ts: str) -> DataFrame:
    """Orders-shipped pipeline (/root/reference/lime_survey_orders_shipped.py:48-74).

    project 5 cols (:55-56) → dropna all (:57) → rename (:60-66) →
    audit ts (:67) → keep-latest dedup per order_number by date_sent
    (:69-70; deterministic tiebreak on id_answer desc — the reference's
    unstable quicksort makes ties nondeterministic, SURVEY.md §2.5 O2) →
    grade whitelist A1..A5 (:73) → literal "A" strip + cast (:74).
    """
    df = core.project(flat, ["id", "datestamp", "q01", "q03", "q06"])
    df = core.drop_null_any(df)  # lime_survey_orders_shipped.py:57
    df = core.rename(df, ORDERS_RENAME)
    df = core.with_audit_ts(df, run_ts)
    df = core.dedup_latest(df, key="order_number", order_by="date_sent", tiebreak="id_answer")
    df = core.filter_isin(df, "grade", GRADE_WHITELIST)
    df = core.clean_numeric(df, "grade", "A")
    return df.select("id_answer", "date_sent", "grade", "email", "order_number", "updated_ts")
