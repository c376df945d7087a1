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


def _get(url: str) -> tuple[int, dict]:
    import urllib.error

    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_token_auth_required_when_configured(spark, tier_dir):
    """ADVICE r4 (medium): the endpoint evals queries — with a token
    configured, every route but /health must 401 without it and work
    with it (Bearer or X-Kgql-Token)."""
    import urllib.error

    g = kgql.build_view_from_corpus(spark, tier_dir)
    srv = kgql_server.serve(g, port=0, token="s3cret")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, _ = _get(f"{base}/health")
        assert code == 200  # health stays open (liveness probes)
        code, out = _get(f"{base}/help")
        assert code == 401 and not out["success"]
        req = urllib.request.Request(
            f"{base}/query-sync",
            data=json.dumps({"query": "g.conversations().count()"}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        for hdr in ({"Authorization": "Bearer s3cret"}, {"X-Kgql-Token": "s3cret"}):
            req = urllib.request.Request(
                f"{base}/query-sync",
                data=json.dumps({"query": "g.conversations().count()"}).encode(),
                headers=hdr,
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                assert json.loads(r.read())["success"] is True
    finally:
        srv.shutdown()


def test_non_loopback_bind_refused():
    with pytest.raises(ValueError, match="non-loopback"):
        kgql_server.serve(object(), host="0.0.0.0", port=0)
    with pytest.raises(ValueError, match="non-loopback"):
        kgql_server.serve(object(), host="0.0.0.0", port=0, token="t")  # no flag


def test_async_results_bounded(spark, tier_dir, monkeypatch):
    """VERDICT r4 #8: a client that posts async queries and never polls
    must not grow the server without bound — max-entries overflow evicts
    oldest, and entries past RESULT_TTL_SEC expire (fake clock)."""
    import time as _t

    clock = {"t": 0.0}
    monkeypatch.setattr(kgql_server, "MAX_RESULTS", 3)
    g = kgql.build_view_from_corpus(spark, tier_dir)
    srv = kgql_server.serve(g, port=0, clock=lambda: clock["t"])
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def post_async(q):
        req = urllib.request.Request(
            f"{base}/query", data=json.dumps({"query": q}).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())["uuid"]

    def wait_done(qid):
        for _ in range(600):
            code, out = _get(f"{base}/result/{qid}")
            if code != 202:
                return code, out
            _t.sleep(0.2)
        raise TimeoutError(qid)

    try:
        uuids = [post_async("g.turns().count()") for _ in range(5)]
        # wait until all five have finished (pending drained)
        last_code, last_out = wait_done(uuids[-1])
        assert last_code == 200 and last_out["success"]
        # give the earlier worker threads time to store their payloads
        deadline = _t.time() + 60
        while _t.time() < deadline:
            codes = [_get(f"{base}/result/{u}")[0] for u in uuids[:1]]
            if 202 not in codes:
                break
            _t.sleep(0.2)
        # of the 4 remaining stored results, only MAX_RESULTS=3 survive;
        # the oldest was evicted -> exactly one extra 404 beyond the fetched one
        statuses = [_get(f"{base}/result/{u}")[0] for u in uuids[:4]]
        assert statuses.count(404) >= 1
        assert statuses.count(200) <= 3
        # TTL: a fresh result expires once the clock advances past the TTL.
        # Completion is confirmed via a LATER query (fetching qid would
        # consume it — results are single-read).
        qid = post_async("g.turns().count()")
        code2, _ = wait_done(post_async("g.conversations().count()"))
        assert code2 == 200
        _t.sleep(2)  # evals are lock-serialized; let qid's worker store too
        clock["t"] += kgql_server.RESULT_TTL_SEC + 1
        # any mutation evicts; posting one more flushes expired entries
        flush = post_async("g.conversations().count()")
        wait_done(flush)
        code3, _ = _get(f"{base}/result/{qid}")
        assert code3 == 404
    finally:
        srv.shutdown()
