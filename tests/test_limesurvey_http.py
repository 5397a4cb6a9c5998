"""Real-HTTP round-trip tests for the LimeSurvey JSON-RPC client.

Every other LimeSurvey test runs against a fake in-process transport;
this suite stands up a REAL localhost HTTP server (stdlib
ThreadingHTTPServer) speaking the LimeSurvey remote-control JSON-RPC
shapes, so the default ``_RequestsTransport`` path — requests.Session
reuse, cookie handling, raise_for_status, JSON decode — is exercised
end-to-end, including from EXECUTOR workers via the partitioned
extract. (The container has no LimeSurvey server; this is the closest
honest stand-in: the protocol bytes cross a real socket.)
"""

from __future__ import annotations

import base64
import functools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from lime_etl_spark.io.limesurvey import (
    LimeSurveyClient,
    LimeSurveyError,
    extract_responses_partitioned,
)

SID = 771


def _export_payload(from_id: int | None, to_id: int | None, n: int) -> dict:
    lo = 1 if from_id is None else from_id
    hi = n if to_id is None else min(to_id, n)
    return {
        "responses": [
            {
                str(i): {
                    "id": str(i),
                    "token": f"tok{i}",
                    "submitdate": "2024-02-01 10:00:00",
                    "q01": str(i % 10),
                }
            }
            for i in range(lo, hi + 1)
        ]
    }


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 (stdlib casing)
        srv = self.server
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with srv.lock:
            srv.calls.append(
                {
                    "method": body["method"],
                    "params": body["params"],
                    "cookie": self.headers.get("Cookie"),
                }
            )
        if srv.fail_http:
            self.send_response(500)
            self.end_headers()
            return
        result, error, set_cookie = srv.handle(body["method"], body["params"])
        data = json.dumps({"id": body["id"], "result": result, "error": error}).encode()
        self.send_response(200)
        self.send_header("content-type", "application/json")
        if set_cookie:
            self.send_header("Set-Cookie", set_cookie)
        self.send_header("content-length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


class _LimeServer(ThreadingHTTPServer):
    """LimeSurvey-shaped JSON-RPC server: session keys with PHPSESSID
    cookies, base64 JSON exports with iFrom/iToResponseID paging,
    {'status': ...} single-key results for acks and errors."""

    daemon_threads = True

    def __init__(self, n_responses: int = 5):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.lock = threading.Lock()
        self.calls: list[dict] = []
        self.fail_http = False
        self.n_responses = n_responses
        self._seq = 0

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}/admin/remotecontrol"

    def handle(self, method: str, params: list):
        if method == "get_session_key":
            user, password = params[0], params[1]
            if password != "pw":
                return {"status": "Invalid user name or password"}, None, None
            with self.lock:
                self._seq += 1
                seq = self._seq
            return f"key-{user}-{seq}", None, f"PHPSESSID=sess{seq}; Path=/"
        if method == "release_session_key":
            return {"status": "OK"}, None, None
        if method == "list_surveys":
            return [{"sid": str(SID), "surveyls_title": "T"}], None, None
        if method == "delete_survey":
            return {"status": "OK"}, None, None
        if method == "export_responses":
            sid = params[1]
            if sid == 404:
                return {"status": "No Data, could not get max id."}, None, None
            from_id, to_id = params[7], params[8]
            raw = base64.b64encode(
                json.dumps(_export_payload(from_id, to_id, self.n_responses)).encode()
            ).decode()
            return raw, None, None
        if method == "boom":
            return None, {"code": -32600, "message": "kaboom"}, None
        return None, {"code": -32601, "message": f"no such method {method}"}, None


@pytest.fixture()
def server():
    srv = _LimeServer()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(url: str) -> LimeSurveyClient:
    return LimeSurveyClient(url=url, username="u", password="pw")


def test_real_http_lifecycle_and_release(server):
    with _client(server.url) as c:
        surveys = c.list_surveys()
        assert surveys == [{"sid": str(SID), "surveyls_title": "T"}]
        payload = c.export_responses(SID)
        assert len(payload["responses"]) == 5
        key = c._session_key
        assert key and key.startswith("key-u-")
    released = [x for x in server.calls if x["method"] == "release_session_key"]
    assert released and released[0]["params"] == [key]
    assert c._session_key is None
    # the per-client requests.Session was torn down, not leaked
    assert c.transport._session is None


def test_cookies_stay_per_client_over_real_http(server):
    a, b = _client(server.url), _client(server.url)
    try:
        a.list_surveys()
        b.list_surveys()
        a.list_surveys()
        by_cookie = {}
        for call in server.calls:
            if call["cookie"]:
                by_cookie.setdefault(call["cookie"].split("=")[1], set()).add(
                    call["params"][0] if call["params"] else None
                )
        # each PHPSESSID value was only ever replayed with ONE session
        # key — client A's cookie never rides client B's requests
        assert len(by_cookie) == 2
        for keys in by_cookie.values():
            assert len(keys) == 1
    finally:
        a.close()
        b.close()


def test_bad_password_status_result_raises(server):
    c = LimeSurveyClient(url=server.url, username="u", password="nope")
    with pytest.raises(LimeSurveyError, match="Invalid user name or password"):
        c.list_surveys()
    c.close()


def test_error_member_raises_over_real_http(server):
    c = _client(server.url)
    try:
        with pytest.raises(LimeSurveyError, match="kaboom"):
            c._rpc("boom", [])
    finally:
        c.close()


def test_http_500_is_wrapped_as_transport_failure(server):
    c = _client(server.url)
    try:
        server.fail_http = True
        with pytest.raises(LimeSurveyError, match="transport failure"):
            c.list_surveys()
    finally:
        server.fail_http = False
        c.close()


def test_no_data_export_is_an_empty_page_not_an_error(server):
    with _client(server.url) as c:
        assert c.export_responses(404) == {"responses": []}


def test_partitioned_extract_fetches_pages_from_executors(spark, server):
    server.n_responses = 23
    # the factory must unpickle on executor workers, where this TEST
    # module is not importable — partial over the (packaged) class is
    df = extract_responses_partitioned(
        spark,
        functools.partial(
            LimeSurveyClient, url=server.url, username="u", password="pw"
        ),
        SID,
        max_response_id=23,
        page_size=10,
    )
    rows = df.collect()
    assert len(rows) == 23
    assert {r["index"] for r in rows} == {str(i) for i in range(1, 24)}
    assert {r["token"] for r in rows} == {f"tok{i}" for i in range(1, 24)}
    # server-side paging was actually used: 3 export calls with ranges
    exports = [x for x in server.calls if x["method"] == "export_responses"]
    assert sorted((x["params"][7], x["params"][8]) for x in exports) == [
        (1, 10), (11, 20), (21, 23),
    ]
    # every executor page released its client's session afterwards
    keys = {x["params"][0] for x in exports}
    released = {
        x["params"][0] for x in server.calls if x["method"] == "release_session_key"
    }
    assert keys <= released
