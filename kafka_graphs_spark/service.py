"""REST serving layer — the reference rest-app re-expressed over Spark.

Reference: kafka-graphs-rest-app rest/server/graph/GraphAlgorithmRouter
.java:32-44 routes and GraphAlgorithmHandler.java (import/prepare/
configure/run/state/configs/result/delete), with the run lifecycle of
GraphAlgorithmState.State (CREATED → RUNNING → HALTED | ERROR,
GraphAlgorithmState.java:71-76).

Spark mapping: graph "topics" are parquet datasets under a store root
(see :mod:`kafka_graphs_spark.importer`); ``/pregel`` instantiates a
registry algorithm (library/registry.py — GraphAlgorithmType parity)
over the named datasets; ``run`` executes asynchronously on a thread
(the reference's Kafka Streams job) and ``GET /pregel/{id}`` polls the
state. Results are served as JSON ``{"key": id, "value": ...}`` rows
three ways: full collect (small results), ``?offset=&limit=`` pages
(bounded collects against the checkpointed result's stable
partitioning), and ``?stream=true`` / ``Accept: text/event-stream``
Server-Sent Events driven by ``toLocalIterator`` — true streaming parity
with the reference's SSE KeyValue proxy
(GraphAlgorithmHandler.java:457-489) with driver memory bounded by one
partition. Pure stdlib (http.server): no web framework required in the
engine container.

Usage::

    python -m kafka_graphs_spark.service --store /data/graphs --port 8080
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import functions as F


class GraphService:
    """Engine-side state: store root + algorithm executions by id."""

    def __init__(self, spark, store_root: str):
        self.spark = spark
        self.store = store_root
        self.execs: dict = {}
        self.lock = threading.Lock()

    # -- handlers (one per route, GraphAlgorithmRouter.java:35-43) --------

    def import_graph(self, body: dict) -> dict:
        from kafka_graphs_spark.importer import run

        argv = [self.store]
        if body.get("verticesFile"):
            argv += ["-vf", body["verticesFile"], "-vt", body.get("verticesTopic", "vertices")]
        if body.get("edgesFile"):
            argv += ["-ef", body["edgesFile"], "-et", body.get("edgesTopic", "edges")]
        if body.get("vertexValueType"):
            argv += ["--vertex-value-type", body["vertexValueType"]]
        if body.get("edgeValueType"):
            argv += ["--edge-value-type", body["edgeValueType"]]
        argv += ["-np", str(body.get("numPartitions", 50))]
        run(argv, spark=self.spark)
        return {"imported": True}

    def prepare_graph(self, body: dict) -> dict:
        # groupEdgesBySourceAndRepartition (GraphAlgorithmHandler.prepare)
        src = f"{self.store}/{body.get('edgesTopic', 'edges')}"
        dst = f"{self.store}/{body.get('edgesGroupedBySourceTopic', 'edgesGroupedBySource')}"
        np_ = int(body.get("numPartitions", 50))
        e = self.spark.read.parquet(src)
        e.repartition(np_, "src").write.mode("overwrite").parquet(dst)
        return {"prepared": True}

    def configure(self, body: dict) -> dict:
        from kafka_graphs_spark import Graph
        from kafka_graphs_spark.library.registry import ALGORITHMS

        name = body["algorithm"]
        if name not in ALGORITHMS:
            raise KeyError(f"unknown algorithm: {name}")
        spec = ALGORITHMS[name]
        edges = self.spark.read.parquet(
            f"{self.store}/{body.get('edgesGroupedBySourceTopic', body.get('edgesTopic', 'edges'))}"
        )
        vt = body.get("verticesTopic")
        if vt:
            vertices = self.spark.read.parquet(f"{self.store}/{vt}")
            graph = Graph(vertices, edges)
        else:
            graph = Graph.from_edges(edges, spec.initial_vertex_value(F.col("id")))
        algo_id = uuid.uuid4().hex[:12]
        with self.lock:
            self.execs[algo_id] = {
                "algorithm": name,
                "graph": graph,
                "configs": dict(body.get("configs", {})),
                "state": "CREATED",
                "result": None,
                "error": None,
            }
        return {"id": algo_id, "state": "CREATED"}

    def run_algorithm(self, algo_id: str, body: dict) -> dict:
        from kafka_graphs_spark.library.registry import ALGORITHMS

        ex = self._get(algo_id)
        spec = ALGORITHMS[ex["algorithm"]]
        params = dict(spec.defaults)
        params.update({k: v for k, v in ex["configs"].items()})
        if body.get("numIterations") is not None:
            params["max_iterations"] = int(body["numIterations"])
        params = {k: v for k, v in params.items() if k in _allowed_params(spec.run)}

        def job():
            try:
                out = spec.run(ex["graph"], **params)
                ex["result"] = out.localCheckpoint(eager=True)
                ex["state"] = "HALTED"  # reference: completed runs HALT
            except Exception as e:  # pragma: no cover - surfaced via state
                ex["error"] = str(e)
                ex["state"] = "ERROR"

        ex["state"] = "RUNNING"
        t = threading.Thread(target=job, daemon=True)
        t.start()
        ex["_thread"] = t
        return {"id": algo_id, "state": ex["state"]}

    def state(self, algo_id: str) -> dict:
        ex = self._get(algo_id)
        out = {"id": algo_id, "algorithm": ex["algorithm"], "state": ex["state"]}
        if ex["error"]:
            out["error"] = ex["error"]
        return out

    def configs(self, algo_id: str) -> dict:
        return dict(self._get(algo_id)["configs"])

    def algorithms(self) -> dict:
        """Registry listing: algorithm name → its tunable defaults
        (the Spark twin of the reference's GraphAlgorithmType enum
        surface — lets a client discover what POST /pregel accepts)."""
        from kafka_graphs_spark.library.registry import ALGORITHMS

        return {
            name: {
                "defaults": dict(spec.defaults),
                "vertexValueType": spec.vertex_value_type,
            }
            for name, spec in sorted(ALGORITHMS.items())
        }

    def _result_frame(self, algo_id: str, key: Optional[str] = None):
        ex = self._get(algo_id)
        if ex["state"] != "HALTED":
            raise ValueError(f"algorithm not complete: {ex['state']}")
        df = ex["result"]
        if key is not None and "id" in df.columns:
            df = df.filter(F.col("id") == int(key))
        return df

    @staticmethod
    def _row_to_json(row, kv: bool) -> dict:
        if kv:
            return {"key": row["id"], "value": row["value"]}
        return row.asDict(recursive=True)

    def result(
        self,
        algo_id: str,
        key: Optional[str] = None,
        offset: Optional[int] = None,
        limit: Optional[int] = None,
    ) -> list:
        """One JSON page of the result. ``offset``/``limit`` page through
        big results without collecting the whole frame to the driver (the
        checkpointed result has stable partitioning, so pages are
        consistent across calls); omit both for the full collect.
        """
        df = self._result_frame(algo_id, key)
        if offset:
            df = df.offset(int(offset))
        if limit is not None:
            df = df.limit(int(limit))
        kv = set(df.columns) >= {"id", "value"}
        return [self._row_to_json(r, kv) for r in df.collect()]

    def result_rows(self, algo_id: str, key: Optional[str] = None):
        """Row iterator over the FULL result with bounded driver memory:
        ``toLocalIterator`` pulls one partition at a time, so serving a
        100 TB-scale result streams instead of materializing. This is the
        Spark twin of the reference's SSE KeyValue stream
        (rest/server/graph/GraphAlgorithmHandler.java:457-489).
        """
        # resolve the frame EAGERLY (not inside the generator): unknown-id /
        # not-complete errors must raise before the handler commits a 200
        # SSE response head — a late raise would corrupt the open stream
        df = self._result_frame(algo_id, key)
        kv = set(df.columns) >= {"id", "value"}

        def rows():
            for r in df.toLocalIterator(prefetchPartitions=True):
                yield self._row_to_json(r, kv)

        return rows()

    def delete(self, algo_id: str) -> dict:
        with self.lock:
            self._get(algo_id)
            del self.execs[algo_id]
        return {"deleted": algo_id}

    def _get(self, algo_id: str) -> dict:
        if algo_id not in self.execs:
            raise KeyError(f"no such algorithm: {algo_id}")
        return self.execs[algo_id]


def _allowed_params(fn) -> set:
    import inspect

    return set(inspect.signature(fn).parameters) - {"graph"}


def make_handler(service: GraphService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test servers
            pass

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}") if n else {}

        def _send(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _send_sse(self, rows):
            # Server-Sent Events twin of the reference's SSE result proxy
            # (GraphAlgorithmHandler.java:457-489): one `data:` event per
            # row, written as rows arrive from toLocalIterator — driver
            # and server memory stay bounded by one partition/one row.
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            for row in rows:
                self.wfile.write(b"data: " + json.dumps(row).encode() + b"\n\n")
            self.wfile.write(b"event: end\ndata: {}\n\n")

        def _query(self) -> dict:
            from urllib.parse import parse_qsl

            q = self.path.split("?", 1)
            return dict(parse_qsl(q[1])) if len(q) == 2 else {}

        def _route(self, method):
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            try:
                if method == "POST" and parts == ["import"]:
                    return self._send(service.import_graph(self._body()))
                if method == "POST" and parts == ["prepare"]:
                    return self._send(service.prepare_graph(self._body()))
                if method == "GET" and parts == ["algorithms"]:
                    return self._send(service.algorithms())
                if method == "POST" and parts == ["pregel"]:
                    return self._send(service.configure(self._body()))
                if len(parts) == 2 and parts[0] == "pregel":
                    if method == "POST":
                        return self._send(service.run_algorithm(parts[1], self._body()))
                    if method == "GET":
                        return self._send(service.state(parts[1]))
                    if method == "DELETE":
                        return self._send(service.delete(parts[1]))
                if len(parts) == 3 and parts[0] == "pregel":
                    if parts[2] == "configs" and method == "GET":
                        return self._send(service.configs(parts[1]))
                    if parts[2] == "result" and method == "GET":
                        q = self._query()
                        wants_sse = q.get("stream") == "true" or "text/event-stream" in (
                            self.headers.get("Accept") or ""
                        )
                        if wants_sse:
                            return self._send_sse(
                                service.result_rows(parts[1], q.get("key"))
                            )
                        return self._send(
                            service.result(
                                parts[1],
                                q.get("key"),
                                offset=int(q["offset"]) if "offset" in q else None,
                                limit=int(q["limit"]) if "limit" in q else None,
                            )
                        )
                    if parts[2] == "result" and method == "POST":
                        return self._send(
                            service.result(parts[1], self._body().get("key"))
                        )
                return self._send({"error": "not found"}, 404)
            except KeyError as e:
                return self._send({"error": str(e)}, 404)
            except ValueError as e:
                return self._send({"error": str(e)}, 409)
            except Exception as e:  # pragma: no cover
                return self._send({"error": str(e)}, 500)

        def do_GET(self):
            self._route("GET")

        def do_POST(self):
            self._route("POST")

        def do_DELETE(self):
            self._route("DELETE")

    return Handler


def serve(spark, store_root: str, port: int = 8080) -> ThreadingHTTPServer:
    """Start the service (non-blocking); returns the server object."""
    service = GraphService(spark, store_root)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def main(argv=None) -> int:
    import argparse

    from pyspark.sql import SparkSession

    p = argparse.ArgumentParser(prog="python -m kafka_graphs_spark.service")
    p.add_argument("--store", required=True, help="Graph store root (parquet datasets).")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--master", default="local[*]")
    args = p.parse_args(argv)
    spark = SparkSession.builder.master(args.master).appName(
        "kafka-graphs-spark-service"
    ).getOrCreate()
    server = serve(spark, args.store, args.port)
    print(f"serving on :{args.port} (store={args.store})", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
