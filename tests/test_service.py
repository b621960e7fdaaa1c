"""REST serving-layer lifecycle test (GraphAlgorithmRouter.java parity).

Drives the full reference flow over real HTTP: import text files into the
store, prepare (group by source), configure a registry algorithm, run it,
poll state to HALTED, fetch full + filtered results, delete.
"""

import json
import time
import urllib.request

import pytest


@pytest.fixture()
def server(spark, tmp_path):
    from kafka_graphs_spark.service import GraphService, ThreadingHTTPServer, make_handler
    import threading

    service = GraphService(spark, str(tmp_path / "store"))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def call(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_full_lifecycle(server, tmp_path):
    ef = tmp_path / "edges.txt"
    # two components: {1,2,3} and {10,11}
    ef.write_text("1 2 1\n2 3 1\n10 11 1\n")

    code, out = call(server, "POST", "/import", {"edgesFile": str(ef), "numPartitions": 2})
    assert code == 200 and out["imported"]

    code, out = call(server, "POST", "/prepare", {"numPartitions": 2})
    assert code == 200 and out["prepared"]

    code, out = call(server, "POST", "/pregel",
                     {"algorithm": "wcc", "configs": {}})
    assert code == 200 and out["state"] == "CREATED"
    algo_id = out["id"]

    code, out = call(server, "GET", f"/pregel/{algo_id}/configs")
    assert code == 200 and out == {}

    code, out = call(server, "POST", f"/pregel/{algo_id}", {"numIterations": 20})
    assert code == 200 and out["state"] in ("RUNNING", "HALTED")

    for _ in range(120):
        code, out = call(server, "GET", f"/pregel/{algo_id}")
        assert code == 200
        if out["state"] in ("HALTED", "ERROR"):
            break
        time.sleep(0.5)
    assert out["state"] == "HALTED", out

    code, rows = call(server, "GET", f"/pregel/{algo_id}/result")
    assert code == 200
    got = {r["key"]: r["value"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    code, rows = call(server, "POST", f"/pregel/{algo_id}/result", {"key": "11"})
    assert code == 200 and rows == [{"key": 11, "value": 10}]

    # offset/limit pages partition the same row set, no overlap, no gaps
    pages = []
    for off in range(0, 5, 2):
        code, page = call(
            server, "GET", f"/pregel/{algo_id}/result?offset={off}&limit=2"
        )
        assert code == 200 and len(page) <= 2
        pages.extend(page)
    assert {r["key"]: r["value"] for r in pages} == got

    # SSE stream: one data: event per row, terminated by an end event
    req = urllib.request.Request(
        server + f"/pregel/{algo_id}/result?stream=true",
        headers={"Accept": "text/event-stream"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        body = resp.read().decode()
    events = [
        json.loads(line[len("data: "):])
        for line in body.splitlines()
        if line.startswith("data: ")
    ]
    assert {r["key"]: r["value"] for r in events[:-1]} == got
    assert body.rstrip().endswith("event: end\ndata: {}") or events[-1] == {}

    code, out = call(server, "DELETE", f"/pregel/{algo_id}")
    assert code == 200
    code, _ = call(server, "GET", f"/pregel/{algo_id}")
    assert code == 404


def test_result_before_completion_conflicts(server, tmp_path):
    ef = tmp_path / "e2.txt"
    ef.write_text("1 2 1\n")
    call(server, "POST", "/import", {"edgesFile": str(ef), "edgesTopic": "e2"})
    code, out = call(server, "POST", "/pregel", {"algorithm": "wcc", "edgesTopic": "e2"})
    algo_id = out["id"]
    code, out = call(server, "GET", f"/pregel/{algo_id}/result")
    assert code == 409


def test_unknown_algorithm_404(server):
    code, out = call(server, "POST", "/pregel", {"algorithm": "nope"})
    assert code == 404


def test_sse_error_before_completion_is_clean_409(server, tmp_path):
    """The SSE route must resolve the result frame BEFORE committing a
    200/event-stream head — an unfinished algorithm yields a plain 409
    JSON error, never a corrupted open stream."""
    ef = tmp_path / "e3.txt"
    ef.write_text("1 2 1\n")
    call(server, "POST", "/import", {"edgesFile": str(ef), "edgesTopic": "e3"})
    code, out = call(server, "POST", "/pregel", {"algorithm": "wcc", "edgesTopic": "e3"})
    algo_id = out["id"]
    code, out = call(
        server, "GET", f"/pregel/{algo_id}/result?stream=true"
    )
    assert code == 409 and "error" in out

    code, out = call(server, "GET", "/pregel/doesnotexist/result?stream=true")
    assert code == 404 and "error" in out


def test_algorithms_listing(server):
    code, out = call(server, "GET", "/algorithms")
    assert code == 200
    # registry surface: reference enum algorithms plus beyond-ref additions
    for name in ("bfs", "wcc", "pagerank", "sssp", "svdpp", "lcc", "lp", "mssp",
                 "hits", "ktruss", "katz", "closeness", "betweenness"):
        assert name in out, name
    assert out["pagerank"]["defaults"]["tolerance"] == 0.0001
    assert out["bfs"]["vertexValueType"] == "long"


def test_round4_algorithms_over_rest(server, tmp_path):
    """scc and topo_levels run end-to-end through the REST lifecycle."""
    ef = tmp_path / "edges_r4.txt"
    # cycle {1,2,3} feeding a DAG tail 3->4->5
    ef.write_text("1 2 1\n2 3 1\n3 1 1\n3 4 1\n4 5 1\n")
    code, out = call(server, "POST", "/import", {"edgesFile": str(ef), "numPartitions": 2})
    assert code == 200
    code, out = call(server, "POST", "/prepare", {"numPartitions": 2})
    assert code == 200

    code, out = call(server, "POST", "/pregel", {"algorithm": "scc", "configs": {}})
    assert code == 200
    algo_id = out["id"]
    code, out = call(server, "POST", f"/pregel/{algo_id}", {"numIterations": 50})
    assert code == 200
    for _ in range(120):
        code, out = call(server, "GET", f"/pregel/{algo_id}")
        if out["state"] in ("HALTED", "ERROR"):
            break
        time.sleep(0.5)
    assert out["state"] == "HALTED"
    code, rows = call(server, "GET", f"/pregel/{algo_id}/result")
    assert code == 200
    got = {r["key"]: r["value"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    call(server, "DELETE", f"/pregel/{algo_id}")
