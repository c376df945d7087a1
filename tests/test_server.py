"""HTTP query endpoint (tools/kgql_server.py) — the CPGQLServer analog:
start the server on a live GraphView, post queries, assert JSON contracts
(the reference's CPGQLServerTests pattern: sync query in, result out,
errors as structured responses, console state reused across requests)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from tools import kgql, kgql_server


@pytest.fixture(scope="module")
def server(spark, tier_dir):
    g = kgql.build_view_from_corpus(spark, tier_dir)
    srv = kgql_server.serve(g, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base: str, query: str) -> dict:
    req = urllib.request.Request(
        f"{base}/query-sync",
        data=json.dumps({"query": query}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def test_health_and_help(server):
    with urllib.request.urlopen(f"{server}/health", timeout=30) as r:
        assert json.loads(r.read()) == {"success": True}
    with urllib.request.urlopen(f"{server}/help", timeout=120) as r:
        out = json.loads(r.read())
    assert out["success"] and "out" in out["stdout"]


def test_query_sync_traversal(server):
    out = _post(server, "g.conversations().count()")
    assert out["success"] is True
    assert out["stdout"].strip() == "50"
    # a chained traversal through the DSL, same session state
    out = _post(server, 'g.conversations().has(name="c000000").out("AST").count()')
    assert out["success"] is True
    assert out["stdout"].strip() == "200"


def test_query_sync_error_is_response(server):
    out = _post(server, "g.nonsense_step()")
    assert out["success"] is False and "nonsense_step" in out["error"]


def test_unknown_endpoint_404(server):
    req = urllib.request.Request(f"{server}/nope", method="POST", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404


def test_async_query_and_result(server):
    """The reference's async pair (/query -> uuid, /result/<uuid>): submit,
    poll until done, fetch once (result is then dropped), unknown uuid 404,
    async errors come back as structured results."""
    import time
    import urllib.error

    def post_async(query):
        req = urllib.request.Request(
            f"{server}/query",
            data=json.dumps({"query": query}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    def fetch(qid):
        try:
            with urllib.request.urlopen(f"{server}/result/{qid}", timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    sub = post_async("g.turns().count()")
    assert sub["success"] and "uuid" in sub
    deadline = time.time() + 120
    while True:
        code, payload = fetch(sub["uuid"])
        if code != 202:
            break
        assert payload.get("pending") is True
        assert time.time() < deadline, "async query never completed"
        time.sleep(0.2)
    assert code == 200 and payload["success"]
    assert int(payload["stdout"]) > 0
    # single-read: the result was dropped after the fetch
    code2, _ = fetch(sub["uuid"])
    assert code2 == 404
    # unknown uuid
    code3, _ = fetch("no-such-uuid")
    assert code3 == 404
    # async evaluation errors are structured results, not 5xx
    sub2 = post_async("definitely_not_defined()")
    while True:
        code4, payload4 = fetch(sub2["uuid"])
        if code4 != 202:
            break
        time.sleep(0.2)
    assert code4 == 200 and payload4["success"] is False
    assert "error" in payload4
