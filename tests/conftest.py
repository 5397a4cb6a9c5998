from __future__ import annotations

import json
import os

import pytest

from lime_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = get_spark(
        "lime_etl_spark-tests",
        shuffle_partitions=8,
        # static conf — must be set at session creation (bucketed-table tests)
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="lime_wh_")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return ORACLE_SF_DIR


# Synthetic LimeSurvey export fixture — shared with the registry's
# pipeline smoke queries (lime_etl_spark/pipelines/fixtures.py).
from lime_etl_spark.pipelines.fixtures import make_survey_payload  # noqa: E402,F401


@pytest.fixture(scope="session")
def survey_json_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("survey") / "export.json"
    path.write_text(json.dumps(make_survey_payload()), encoding="utf-8")
    return str(path)
