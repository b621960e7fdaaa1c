"""Round-14 optimization pins.

1. Literal frontier rounds (paths.py): results identical to the join
   path on graphs that exercise literal-only, the literal→dense hub
   fallback, and the dense→literal tail re-entry; iteration caps count
   literal rounds exactly like join rounds.
2. prunable_source (_loop.py): storage-only plans pass through,
   shuffle-bearing plans fall back.
3. svdpp vectorized supersteps (cf.py): unchanged results vs pinned
   goldens is covered by test_library's determinism/rmse tests and the
   parity sweep; here we pin the chunking edge — padded-chunk
   boundaries (users with wildly different rating counts sharing or
   not sharing a chunk) must be invisible in the output bits.
"""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library import _loop, paths


def _graph(spark, edges):
    rows = [(int(s), int(d), float(w)) for s, d, w in edges]
    e = spark.createDataFrame(rows, "src long, dst long, value double")
    return Graph.from_edges(e, F.lit(0.0))


@pytest.fixture(scope="module")
def hub_graph(spark):
    """src 0 fans out to 100 vertices (frontier blows past _LITERAL_MAX
    at hop 1 → dense fallback), which funnel into a chain tail
    (frontier returns to 1 → literal re-entry)."""
    edges = [(0, i, float(i)) for i in range(1, 101)]
    edges += [(i, 200, 1.0) for i in range(1, 101)]
    edges += [(200 + i, 201 + i, 0.5) for i in range(0, 5)]
    return _graph(spark, edges)


@pytest.fixture(autouse=True)
def _literal_mode_on(monkeypatch):
    """Test graphs are far below the production |E| gate — force the
    literal path on so these tests exercise it."""
    monkeypatch.setattr(paths, "_LITERAL_MIN_EDGES", 0)


class TestLiteralFrontier:
    def _dense_reference(self, op, graph, *args, **kw):
        """Run the operator with literal mode disabled (join path only)."""
        orig = paths._frontier_loop

        def no_literal(loop, state, step, max_iterations, **kwargs):
            kwargs.pop("literal_step", None)
            return orig(loop, state, step, max_iterations, **kwargs)

        paths._frontier_loop = no_literal
        try:
            return {r["id"]: r["value"] for r in op(graph, *args, **kw).collect()}
        finally:
            paths._frontier_loop = orig

    @pytest.mark.parametrize("op", [paths.bfs, paths.sssp,
                                    paths.temporal_earliest_arrival])
    def test_hub_fallback_and_reentry(self, spark, hub_graph, op):
        lit = {r["id"]: r["value"] for r in op(hub_graph, 0).collect()}
        dense = self._dense_reference(op, hub_graph, 0)
        assert lit == dense

    def test_departure_hub(self, spark, hub_graph):
        # backward traversal: target 200 has 100 in-edges → dense hop,
        # then the fan-in sources are leaves
        lit = {r["id"]: r["value"]
               for r in paths.temporal_latest_departure(hub_graph, 200, 10).collect()}
        dense = self._dense_reference(
            paths.temporal_latest_departure, hub_graph, 200, 10)
        assert lit == dense

    def test_iteration_cap_counts_literal_rounds(self, spark):
        # 10-edge chain, cap at 3 rounds: exactly hops 0..3 labeled
        g = _graph(spark, [(i, i + 1, 1.0) for i in range(10)])
        got = {r["id"]: r["value"]
               for r in paths.bfs(g, 0, max_iterations=3).collect()}
        expect = {i: (i if i <= 3 else _loop.MAX_LONG) for i in range(11)}
        assert got == expect
        dense = self._dense_reference(paths.bfs, g, 0, max_iterations=3)
        assert got == dense

    def test_missing_source_all_unreached(self, spark):
        g = _graph(spark, [(0, 1, 1.0)])
        got = {r["id"]: r["value"] for r in paths.sssp(g, 99).collect()}
        assert got == {0: _loop.INF, 1: _loop.INF}


class TestPrunableSource:
    def test_parquet_scan_is_prunable(self, spark, tmp_path):
        p = str(tmp_path / "edges.parquet")
        spark.createDataFrame(
            [(1, 2, 0.5)], "src long, dst long, value double"
        ).write.parquet(p)
        df = spark.read.parquet(p).select("src", "dst")
        assert _loop.prunable_source(df) is df

    def test_shuffle_bearing_plans_fall_back(self, spark):
        base = spark.createDataFrame([(1, 2)], "src long, dst long")
        agg = base.groupBy("src").agg(F.count("*").alias("n"))
        assert _loop.prunable_source(agg) is None
        joined = base.join(base.withColumnRenamed("src", "s2"), on="dst")
        assert _loop.prunable_source(joined) is None

    def test_literal_round_filter_reaches_parquet(self, spark, tmp_path):
        # the literal round over a parquet-backed graph pushes the
        # frontier IN filter into the scan (guide §6 pruning evidence)
        p = str(tmp_path / "g.parquet")
        spark.createDataFrame(
            [(i, i + 1, 1.0) for i in range(20)],
            "src long, dst long, value double",
        ).write.parquet(p)
        e = spark.read.parquet(p)
        g = Graph.from_edges(e, F.lit(0.0))
        captured = {}
        orig = paths._frontier_loop

        def capture(loop, state, step, max_iterations, literal_step=None, **kw):
            if literal_step is not None:
                frame = literal_step(state, [{"id": 0, "value": 0.0}], 1)
                captured["plan"] = frame._jdf.queryExecution().executedPlan().toString()
            return orig(loop, state, step, max_iterations,
                        literal_step=literal_step, **kw)

        paths._frontier_loop = capture
        try:
            paths.sssp(g, 0).count()
        finally:
            paths._frontier_loop = orig
        plan = captured["plan"]
        # the frontier filter reached the parquet scan
        assert "PushedFilters" in plan, plan
        assert "In(src" in plan or "EqualTo(src" in plan, plan
        # the MESSAGE side is join-free: the only join left in a literal
        # round is the full-outer state merge (no frontier⋈edges
        # broadcast join)
        assert "BroadcastHashJoin" not in plan, plan
        assert plan.count("SortMergeJoin") <= 1, plan


class TestSvdppVectorized:
    def test_chunk_boundaries_do_not_change_results(self, spark, monkeypatch):
        # one hub user (30 ratings) + singleton users: with the pad
        # budget squeezed to a few elements every user lands in its own
        # padded chunk; with the default budget they share one. The
        # length-sorted masked-lane chunking must be invisible --
        # bitwise-identical factors either way (lanes are independent).
        from kafka_graphs_spark.library import cf, svdpp

        edges = [(0, 1000 + i, float(1 + i % 5)) for i in range(30)]
        edges += [(u, 1000 + u, 3.0) for u in range(1, 8)]
        e1 = spark.createDataFrame(edges, "src long, dst long, value double")
        g = Graph.from_edges(e1, F.lit(0.0))

        def run():
            u, i, m = svdpp(g, dim=3, iterations=2, seed=5)
            canon = {}
            # users are (id, b, p); items are (id, b, q, y)
            for tag, df in (("u", u), ("i", i)):
                for d in (r.asDict() for r in df.collect()):
                    canon[(tag, d["id"])] = (
                        d["b"],
                        tuple(d["p"] if tag == "u" else d["q"]),
                        tuple(d.get("y") or ()),
                    )
            return m, canon

        m1, c1 = run()
        monkeypatch.setattr(cf, "_PAD_BUDGET", 8)  # 1-2 users per chunk
        m2, c2 = run()
        assert m1 == m2
        assert c1 == c2
