"""Wire-protocol connector + serving-layer tests.

Round-3 review listed three "missing" capabilities — the live REST
rewards pull, the GraphQL transactions pull with TOTP login/session
retry, and the serving/BI endpoint (reference api.py:36-200 and
README.md Looker layer). These tests run the engine's stdlib
implementations against a local fixture HTTP server that speaks the
reference's protocol: TOTP-validated login that drops the first token
(exercising the timeout retry), bearer-auth rewards GET, Hasura-shaped
GraphQL POST applying filter/sort/limit/offset server-side, and a flaky
endpoint for the C2 retry policy.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cashback_data_pipeline_spark.schemas import REWARDS_RAW, TRANSACTIONS_RAW
from cashback_data_pipeline_spark.sources.connectors import (
    ApiSession,
    ConnectorError,
    fetch_rewards_df,
    fetch_transactions_df,
    totp_now,
)

SECRET = "GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ"  # RFC 6238 test secret, base32

REWARDS_FIXTURE = [
    {
        "id": "r1", "user_id": "u1", "amount": 0.09, "rebate_rate": 3,
        "type": "DAILY_REBATE_DISTRIBUTION", "reference_type": "contis_transactions",
        "reference_id": "t1", "available": True,
        "reason": "Automated approval. Trx below 500", "base_rate": 3,
        "staking_rate": 0, "subscription_plan": "premium", "exchange_rate_id": "x1",
        "fiat_amount_rewarded": 798.0, "approved_by": None,
        "createdAt": "2024-03-25T06:43:56Z", "updatedAt": "2024-03-25T06:43:56Z",
        "contis_transaction": None, "fiat_transaction": None,
    },
    {
        "id": "r2", "user_id": "u1", "amount": 1.5, "rebate_rate": 0,
        "type": "REBATE_BONUS", "reference_type": "perk", "reference_id": None,
        "available": True, "reason": None, "base_rate": 0, "staking_rate": 0,
        "subscription_plan": None, "exchange_rate_id": "x1",
        "fiat_amount_rewarded": 3143.0, "approved_by": None,
        "createdAt": "2024-03-26T07:00:00Z", "updatedAt": "2024-03-26T07:00:00Z",
        "contis_transaction": None, "fiat_transaction": None,
    },
]

TRANSACTIONS_FIXTURE = [
    {"id": f"t{i}", "model": "ContisTransaction", "user_id": "u1", "currency": "GBP",
     "amount": -100 * (i + 1), "date": f"2024-03-{10 + i:02d}T12:00:00Z",
     "type": "CARD_SETTLEMENT" if i % 2 == 0 else "31", "is_debit": True,
     "description": f"MERCHANT {i}", "__typename": "transactions_view"}
    for i in range(8)
]


class FixtureApi(BaseHTTPRequestHandler):
    """Reference-protocol fixture server (state on the server object)."""

    def log_message(self, *args):
        pass

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def _send(self, status: int, body) -> None:
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self) -> None:  # noqa: N802
        srv = self.server
        if self.path == "/auth/login":
            srv.login_posts += 1
            body = self._body()
            # validate the TOTP server-side (±1 interval of clock skew)
            import time as _t

            now = _t.time()
            valid = {totp_now(SECRET, at=now + d) for d in (-30, 0, 30)}
            if body.get("token") not in valid or body.get("password") != "pw":
                self._send(200, {"error": "bad credentials"})
                return
            # drop the first otherwise-valid login to exercise the
            # token-timeout retry (reference api.py:66-78)
            if srv.login_posts <= srv.drop_first_logins:
                self._send(200, {})
                return
            self._send(200, {"id_token": "tok-123"})
        elif self.path == "/v1alpha1/graphql":
            if self.headers.get("Authorization") != "Bearer tok-123":
                self._send(401, {"error": "unauthorized"})
                return
            payload = self._body()
            srv.graphql_variables.append(payload["variables"])
            v = payload["variables"]
            rows = [dict(r) for r in TRANSACTIONS_FIXTURE]
            if v.get("from"):
                rows = [r for r in rows if r["date"] >= v["from"]]
            if v.get("to"):
                rows = [r for r in rows if r["date"] <= v["to"]]
            if v.get("type"):
                rows = [r for r in rows if r["type"] == v["type"]]
            rows.sort(key=lambda r: r["date"], reverse=True)
            total = len(rows)
            off = v.get("offset") or 0
            rows = rows[off : off + v["limit"]] if v.get("limit") is not None else rows[off:]
            self._send(200, {"data": {
                "transactions_view_aggregate": {"aggregate": {"totalCount": total}},
                "transactions_view": rows,
            }})
        else:
            self._send(404, {"error": "not found"})

    def do_GET(self) -> None:  # noqa: N802
        srv = self.server
        if self.path == "/platform/transactions/pluton":
            if self.headers.get("Authorization") != "Bearer tok-123":
                self._send(401, {"error": "unauthorized"})
                return
            srv.reward_gets += 1
            # flaky seam: fail with 500 until `fail_rewards` is exhausted
            if srv.reward_gets <= srv.fail_rewards:
                self._send(500, {"error": "transient"})
                return
            self._send(200, REWARDS_FIXTURE)
        else:
            self._send(404, {"error": "not found"})


@pytest.fixture()
def api_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), FixtureApi)
    server.login_posts = 0
    server.reward_gets = 0
    server.drop_first_logins = 1
    server.fail_rewards = 0
    server.graphql_variables = []
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield server, base
    server.shutdown()
    server.server_close()


def make_session(base: str) -> ApiSession:
    return ApiSession(base, "a@b.c", "pw", SECRET, retry_base_delay=0.01)


def test_login_retries_totp_once_and_sets_bearer(api_server):
    server, base = api_server
    s = make_session(base)
    s.login()
    assert server.login_posts == 2  # first valid login dropped → one retry
    assert s.headers["Authorization"] == "Bearer tok-123"


def test_login_fails_cleanly_on_bad_password(api_server):
    _, base = api_server
    s = ApiSession(base, "a@b.c", "WRONG", SECRET, retry_base_delay=0.01)
    with pytest.raises(ConnectorError, match="no id_token"):
        s.login()


def test_rewards_pull_lands_typed_dataframe(spark, api_server):
    _, base = api_server
    df = fetch_rewards_df(spark, make_session(base))
    rows = {r["id"]: r for r in df.collect()}
    # JSON scans surface every field nullable; names/types must match
    assert [(f.name, f.dataType) for f in df.schema] == [(f.name, f.dataType) for f in REWARDS_RAW]
    assert set(rows) == {"r1", "r2"}
    assert rows["r1"]["createdAt"].year == 2024  # ISO string coerced
    assert rows["r2"]["reference_id"] is None


def test_rewards_pull_survives_transient_500s(api_server):
    server, base = api_server
    server.fail_rewards = 2  # two 500s, third attempt succeeds (C2 = 3 attempts)
    s = make_session(base)
    assert [r["id"] for r in s.get_rewards()] == ["r1", "r2"]
    assert server.reward_gets == 3


def test_rewards_pull_exhausts_retries(api_server):
    server, base = api_server
    server.fail_rewards = 99
    with pytest.raises(ConnectorError):
        make_session(base).get_rewards()
    assert server.reward_gets == 3  # C2 policy: exactly 3 attempts


def test_graphql_pushdown_rides_in_variables(spark, api_server):
    server, base = api_server
    df = fetch_transactions_df(
        spark,
        make_session(base),
        offset=1,
        limit=2,
        date_from="2024-03-12T00:00:00Z",
        txn_type="CARD_SETTLEMENT",
    )
    # the server saw the pushdown parameters (nothing filtered client-side)
    assert server.graphql_variables == [{
        "offset": 1, "limit": 2, "from": "2024-03-12T00:00:00Z",
        "to": None, "type": "CARD_SETTLEMENT",
    }]
    # fixture: CARD_SETTLEMENT ∧ date≥03-12 → t2,t4,t6 desc = t6,t4,t2;
    # offset 1 limit 2 → t4,t2
    assert [r["id"] for r in df.collect()] == ["t4", "t2"]
    assert [(f.name, f.dataType) for f in df.schema] == [(f.name, f.dataType) for f in TRANSACTIONS_RAW]


def test_fetched_frames_run_the_reference_pipeline(spark, api_server, tmp_path):
    from cashback_data_pipeline_spark.plans import run_pipeline

    _, base = api_server
    s = make_session(base)
    result = run_pipeline(
        spark,
        fetch_rewards_df(spark, s),
        fetch_transactions_df(spark, s),
        str(tmp_path / "warehouse"),
        str(tmp_path / "serving"),
    )
    assert result.rows_transformed == 2
    assert result.rows_loaded == 2


def test_serving_api_roundtrip(spark):
    from cashback_data_pipeline_spark.serving import ServingApi

    api = ServingApi({
        "monthly": lambda: spark.range(3).selectExpr("id", "id * 2 as v"),
        "boom": lambda: (_ for _ in ()).throw(RuntimeError("nope")),
    })
    port = api.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read())

        status, health = get("/health")
        assert status == 200 and health["queries"] == ["boom", "monthly"]

        status, body = get("/query/monthly?limit=2")
        assert status == 200
        assert body["rows"] == [{"id": 0, "v": 0}, {"id": 1, "v": 2}]
        assert body["truncated"] is True

        status, body = get("/query/monthly")
        assert body["n"] == 3 and body["truncated"] is False

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/query/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/query/boom")
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        api.stop()
