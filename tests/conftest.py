from __future__ import annotations

import json
import os

import pytest

from lime_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

# Two-tier suite (round-11): the default run is the driver-facing fast
# gate; `slow`-marked tests (wide generative sweeps, kill/restart
# loops, soak scenarios — see pytest.ini) only run with
# LIME_FULL_SUITE=1. Skipped, not deselected, so the fast gate's output
# still shows the full collection and the tier boundary is auditable.
RUN_FULL_SUITE = os.environ.get("LIME_FULL_SUITE") == "1"


def pytest_collection_modifyitems(config, items):
    if RUN_FULL_SUITE:
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: set LIME_FULL_SUITE=1 (depth evidenced by the "
        "committed GENCHECK_*/FAULT_CHECK_*/SOAK_* artifacts)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


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


# --- pyspark collect-socket hygiene (round-9, VERDICT r8 task #7) ---------
# DataFrame.collect() routes rows through a driver-local TCP socket that
# pyspark leaves to the garbage collector ("The socket will be
# automatically closed when garbage-collected" — pyspark/util.py,
# _load_from_socket). The first such socket the GC reaps surfaces as the
# suite's only ResourceWarning (traced with PYTHONTRACEMALLOC to
# pyspark's _load_from_socket, not to any repo code). Wrap it so the
# socket pair is closed DETERMINISTICALLY when the result stream is
# exhausted or abandoned — a test-hygiene shim over pinned pyspark
# 4.1.2; if the private surface drifts, the shim degrades to a no-op and
# the warning (harmless) returns.
def _install_closing_collect_socket() -> None:
    try:
        import pyspark.util as _psu
        from pyspark.sql.classic import dataframe as _cdf

        _local_connect_and_auth = _psu.local_connect_and_auth

        def _load_from_socket_closing(sock_info, serializer):
            sockfile, sock = _local_connect_and_auth(sock_info[0], sock_info[1])
            sock.settimeout(None)

            def _gen():
                try:
                    yield from serializer.load_stream(sockfile)
                finally:
                    try:
                        sockfile.close()
                    finally:
                        sock.close()

            return _gen()

        _psu._load_from_socket = _load_from_socket_closing
        # the classic DataFrame module imported the symbol by value
        if hasattr(_cdf, "_load_from_socket"):
            _cdf._load_from_socket = _load_from_socket_closing
    except Exception:
        pass  # internals drifted: keep pyspark's GC-based behavior


_install_closing_collect_socket()
