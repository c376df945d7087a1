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
