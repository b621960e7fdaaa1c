"""Generic Pregel runtime surface tests.

Reference semantics under test: ComputeFunction.java:44-267 (compute,
sendMessageTo, setNewVertexValue, voteToHalt, aggregate, add/removeEdge,
masterCompute) and PregelComputation vote-to-halt/termination
(PregelComputation.java:767-770, 804-858).
"""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.pregel import Aggregator, pregel

INF = float("inf")


@pytest.fixture
def chain(spark):
    edges = [(i, i + 1, 1.0) for i in range(9)]
    e = spark.createDataFrame(edges, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(INF))


def sssp_compute(step, vid, value, messages, out_edges, ctx):
    # reference: SingleSourceShortestPaths.java:30-68
    min_dist = 0.0 if vid == ctx.configs["src"] and step == 0 else (
        min(messages) if messages else INF
    )
    if min_dist < (value if value is not None else INF):
        ctx.set_new_vertex_value(min_dist)
        for e in out_edges:
            ctx.send_message_to(e["dst"], min_dist + e["value"])
    ctx.vote_to_halt()


class TestPregelRuntime:
    def test_sssp_with_combiner(self, chain):
        res = pregel(
            chain, sssp_compute, vertex_value_type="double", message_type="double",
            combiner="min", max_iterations=30, configs={"src": 0},
        )
        got = {r["id"]: r["value"] for r in res.vertices.collect()}
        assert got == {i: float(i) for i in range(10)}
        assert res.state == "HALTED"
        assert res.superstep == 10  # frontier reaches vertex 9 then quiesces

    def test_sssp_without_combiner(self, chain):
        res = pregel(
            chain, sssp_compute, vertex_value_type="double", message_type="double",
            max_iterations=30, configs={"src": 0},
        )
        got = {r["id"]: r["value"] for r in res.vertices.collect()}
        assert got == {i: float(i) for i in range(10)}

    def test_max_iterations_caps(self, chain):
        res = pregel(
            chain, sssp_compute, vertex_value_type="double", message_type="double",
            combiner="min", max_iterations=3, configs={"src": 0},
        )
        assert res.state == "COMPLETED"
        assert res.superstep == 3

    def test_aggregators_and_master_halt(self, chain):
        # VertexCount-style: every vertex contributes 1 at superstep 0; master
        # halts immediately (reference AggregatorTest + masterCompute).
        def compute(step, vid, value, messages, out_edges, ctx):
            ctx.aggregate("count", 1.0)
            ctx.vote_to_halt()

        halted_at = {}

        def master(superstep, aggs):
            halted_at.update(aggs)
            return aggs.get("count", 0) >= 10

        res = pregel(
            chain, compute, vertex_value_type="double", message_type="double",
            aggregators={"count": Aggregator("sum")}, master_compute=master,
            max_iterations=5,
        )
        assert res.state == "HALTED"
        assert res.aggregates["count"] == 10.0
        assert res.superstep == 1

    def test_persistent_vs_reset_aggregator(self, chain):
        # persistent accumulates across supersteps; non-persistent resets
        def compute(step, vid, value, messages, out_edges, ctx):
            if step < 2:
                ctx.aggregate("p", 1.0)
                ctx.aggregate("np", 1.0)
                # stay active by not halting
            else:
                ctx.vote_to_halt()

        res = pregel(
            chain, compute, vertex_value_type="double", message_type="double",
            aggregators={"p": Aggregator("sum", persistent=True), "np": Aggregator("sum")},
            max_iterations=5,
        )
        assert res.aggregates["p"] == 20.0  # 10 vertices × 2 supersteps
        assert res.aggregates["np"] == 0.0  # reset after last contribution

    def test_edge_mutation_reverse_edges(self, spark):
        # reference ReverseEdges.java:28-59 via the generic mutation channel
        e = spark.createDataFrame([(1, 2, 7.0), (2, 3, 8.0)], "src long, dst long, value double")
        g = Graph.from_edges(e, F.lit(0.0))

        def compute(step, vid, value, messages, out_edges, ctx):
            if step == 0:
                for edge in out_edges:
                    ctx.add_edge(edge["dst"], vid, edge["value"])
            ctx.vote_to_halt()

        res = pregel(
            g, compute, vertex_value_type="double", message_type="double",
            max_iterations=3,
        )
        got = {(r["src"], r["dst"]): r["value"] for r in res.edges.collect()}
        assert got == {(1, 2): 7.0, (2, 3): 8.0, (2, 1): 7.0, (3, 2): 8.0}

    def test_message_to_nonexistent_vertex_creates_state(self, spark):
        e = spark.createDataFrame([(1, 99, 1.0)], "src long, dst long, value double")
        v = spark.createDataFrame([(1, 0.0)], "id long, value double")
        g = Graph(v, e)  # vertex 99 not in the vertex table

        def compute(step, vid, value, messages, out_edges, ctx):
            if step == 0 and vid == 1:
                ctx.send_message_to(99, 5.0)
            if messages:
                ctx.set_new_vertex_value(sum(messages))
            ctx.vote_to_halt()

        res = pregel(
            g, compute, vertex_value_type="double", message_type="double",
            max_iterations=3,
        )
        got = {r["id"]: r["value"] for r in res.vertices.collect()}
        assert got[99] == 5.0

    def test_pre_post_superstep_hooks(self, chain, tmp_path):
        """pre/postSuperstep run once per partition on the executor, before
        the first / after the last compute call of the superstep.

        Reference: ComputeFunction.java:72-73, invoked per partition at
        PregelComputation.java:743-747 (pre) and :853-855 (post).
        """
        marker_dir = str(tmp_path)

        def pre(step, aggs):
            # partition-scoped setup: visible to compute in the same worker
            import builtins
            builtins._kgs_hook_bonus = 100.0

        def post(step, aggs):
            import os
            # leave one marker per (superstep, worker pid): proves the hook
            # ran executor-side after compute
            open(os.path.join(marker_dir, f"post_{step}_{os.getpid()}"), "w").close()

        def compute(step, vid, value, messages, out_edges, ctx):
            import builtins
            bonus = getattr(builtins, "_kgs_hook_bonus", 0.0)
            ctx.set_new_vertex_value(bonus)
            ctx.vote_to_halt()

        res = pregel(
            chain, compute, vertex_value_type="double", message_type="double",
            max_iterations=1, pre_superstep=pre, post_superstep=post,
        )
        got = {r["id"]: r["value"] for r in res.vertices.collect()}
        # without the pre hook every value would be 0.0
        assert all(v == 100.0 for v in got.values())
        import os
        markers = [f for f in os.listdir(marker_dir) if f.startswith("post_0_")]
        assert markers, "postSuperstep hook left no executor-side markers"
