"""Streaming-tier tests.

Unit tests for the mergeable summaries mirror the reference's only pure
unit tests (test/streaming/summaries/{DisjointSet,AdjacencyListGraph}
Test.java); the library tests mirror
test/streaming/library/{ConnectedComponents,BipartitenessCheck,
ExactTriangleCount,Spanner}Test.java fixtures.
"""

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark.streaming import (
    AdjacencyListGraph,
    Candidates,
    DisjointSet,
    EdgeStream,
    bipartiteness_check,
    collect_summaries,
    connected_components,
    exact_triangle_count,
    spanner,
    summary_bulk_aggregation,
)
from kafka_graphs_spark.graph import EdgeDirection


# ---------------------------------------------------------------------------
# pure summary unit tests
# ---------------------------------------------------------------------------

class TestDisjointSet:
    def test_union_find_merge(self):
        a = DisjointSet()
        a.union(1, 2)
        a.union(3, 4)
        b = DisjointSet()
        b.union(2, 3)
        b.union(5, 6)
        m = a.merge(b)
        comps = m.components()
        assert comps[1] == comps[2] == comps[3] == comps[4] == 1
        assert comps[5] == comps[6] == 5

    def test_path_compression_and_rank(self):
        d = DisjointSet()
        for i in range(10):
            d.union(i, i + 1)
        assert len({d.find(i) for i in range(11)}) == 1


class TestCandidates:
    def test_bipartite_path(self):
        c = Candidates()
        for u, v in [(1, 2), (2, 3), (3, 4)]:
            assert c.add_edge(u, v)
        assert c.success

    def test_odd_cycle_fails(self):
        c = Candidates()
        c.add_edge(1, 2)
        c.add_edge(2, 3)
        assert not c.add_edge(3, 1)  # triangle = odd cycle
        assert not c.success

    def test_even_cycle_ok(self):
        c = Candidates()
        for u, v in [(1, 2), (2, 3), (3, 4), (4, 1)]:
            c.add_edge(u, v)
        assert c.success

    def test_merge_conflict(self):
        a = Candidates()
        a.add_edge(1, 2)
        a.add_edge(2, 3)  # 1,3 same color
        b = Candidates()
        b.add_edge(1, 3)  # 1,3 different colors — conflict on merge
        assert not a.merge(b).success

    def test_merge_ok(self):
        a = Candidates()
        a.add_edge(1, 2)
        b = Candidates()
        b.add_edge(3, 4)
        m = a.merge(b)
        assert m.success
        comps = m.components()
        assert comps[1] == comps[2] and comps[3] == comps[4]
        assert comps[1] != comps[3]

    def test_functional_observe(self):
        c = Candidates().observe_edge(1, 2).observe_edge(2, 3)
        bad = c.observe_edge(1, 3)
        assert c.success and not bad.success


class TestAdjacencyListGraph:
    def test_spanner_skips_short_paths(self):
        g = AdjacencyListGraph(k=2)
        g.observe_edge(1, 2)
        g.observe_edge(2, 3)
        g.observe_edge(1, 3)  # dist(1,3)=2 <= k ⇒ skipped
        assert (1, 3) not in g.edges()

    def test_spanner_adds_long_paths(self):
        g = AdjacencyListGraph(k=1)
        g.observe_edge(1, 2)
        g.observe_edge(2, 3)
        g.observe_edge(1, 3)  # dist(1,3)=2 > k ⇒ kept
        assert (1, 3) in g.edges()

    def test_merge(self):
        a = AdjacencyListGraph(k=2)
        a.observe_edge(1, 2)
        b = AdjacencyListGraph(k=2)
        b.observe_edge(2, 3)
        m = a.merge(b)
        assert m.edges() == [(1, 2), (2, 3)]


# ---------------------------------------------------------------------------
# EdgeStream over a batch frame (same algebra as streaming mode)
# ---------------------------------------------------------------------------

@pytest.fixture
def stream(spark):
    rows = [
        (1, 2, 12.0, "2026-01-01 00:00:05"),
        (1, 3, 13.0, "2026-01-01 00:00:10"),
        (2, 3, 23.0, "2026-01-01 00:00:20"),
        (3, 4, 34.0, "2026-01-01 00:01:10"),
        (3, 5, 35.0, "2026-01-01 00:01:20"),
    ]
    df = spark.createDataFrame(
        rows, "src long, dst long, value double, event_time string"
    ).withColumn("event_time", F.to_timestamp("event_time"))
    return EdgeStream(df)


class TestEdgeStream:
    def test_counts(self, stream):
        assert stream.number_of_edges().collect()[0]["count"] == 5
        assert stream.number_of_vertices().collect()[0]["count"] == 5

    def test_degrees(self, stream):
        degs = {r["id"]: r["degree"] for r in stream.degrees().collect()}
        assert degs == {1: 2, 2: 2, 3: 4, 4: 1, 5: 1}
        out = {r["id"]: r["degree"] for r in stream.out_degrees().collect()}
        assert out == {1: 2, 2: 1, 3: 2}

    def test_reverse_undirected_distinct(self, stream):
        assert stream.reverse().edges.filter("src = 2 and dst = 1").count() == 1
        und = stream.undirected()
        assert und.edges.count() == 10
        assert und.distinct().edges.count() == 10  # no dup pairs here

    def test_filters(self, stream):
        assert stream.filter_edges(F.col("value") > 20).edges.count() == 3
        fv = stream.filter_vertices(lambda v: v != 3)
        assert fv.edges.count() == 1  # only 1→2 survives

    def test_windowed_reduce(self, stream):
        w = stream.slice("1 minute", EdgeDirection.OUT)
        res = w.reduce_on_edges("sum").collect()
        got = {(r["window"]["start"].second, r["id"]): r["value"] for r in res}
        # window 0: 1→(12+13), 2→23; window 60s: 3→(34+35)
        assert got[(0, 1)] == 25.0 and got[(0, 2)] == 23.0 and got[(0, 3)] == 69.0

    def test_sliding_window_reduce(self, stream):
        w = stream.slice("1 minute", EdgeDirection.OUT, slide="30 seconds")
        res = w.reduce_on_edges("sum").collect()
        got = {}
        for r in res:
            s = r["window"]["start"]
            got.setdefault(r["id"], {})[(s.minute, s.second)] = r["value"]
        # each event lands in exactly 2 hopping windows
        assert got[1] == {(59, 30): 25.0, (0, 0): 25.0}
        assert got[3] == {(0, 30): 69.0, (1, 0): 69.0}

    def test_session_window_reduce(self, stream):
        w = stream.slice("1 minute", EdgeDirection.OUT, session_gap="30 seconds")
        res = w.reduce_on_edges("sum").collect()
        got = {r["id"]: r for r in res}
        assert len(res) == 3  # one session per source vertex
        # vertex 3's events are 10s apart — one merged session 01:10→01:50
        s3 = got[3]["window"]
        assert got[3]["value"] == 69.0
        assert (s3["start"].minute, s3["start"].second) == (1, 10)
        assert (s3["end"].minute, s3["end"].second) == (1, 50)

    def test_slide_and_session_exclusive(self, stream):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            stream.slice("1 minute", slide="30 seconds", session_gap="30 seconds")

    def test_fold_neighbors(self, stream):
        w = stream.slice("1 minute", EdgeDirection.OUT)
        res = w.fold_neighbors(
            F.lit(0.0), lambda acc, e: acc + e["value"]
        ).collect()
        got = {(r["window"]["start"].minute, r["id"]): r["value"] for r in res}
        assert got[(0, 1)] == 25.0 and got[(1, 3)] == 69.0


# ---------------------------------------------------------------------------
# windowed summaries via the fold/combine engine
# ---------------------------------------------------------------------------

class TestStreamingLibrary:
    def test_connected_components(self, spark, stream):
        res = connected_components(stream.edges)  # single global window
        summ = collect_summaries(res)[0]
        comps = summ.components()
        assert comps[1] == comps[2] == comps[3] == comps[4] == comps[5]

    def test_connected_components_windowed(self, spark, stream):
        res = connected_components(stream.edges, "1 minute")
        by_window = {w: s.components() for w, s in collect_summaries(res).items()}
        w0 = min(by_window)
        w1 = max(by_window)
        assert by_window[w0][1] == by_window[w0][2] == by_window[w0][3]
        assert by_window[w1][4] == by_window[w1][3]

    def test_bipartiteness(self, spark):
        tri = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        assert not collect_summaries(bipartiteness_check(tri))[0].success
        path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        assert collect_summaries(bipartiteness_check(path))[0].success

    def test_spanner(self, spark):
        tri = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "src long, dst long"
        )
        summ = collect_summaries(spanner(tri, k=2))[0]
        assert len(summ.edges()) == 2  # one triangle edge pruned

    def test_triangle_count(self, spark, stream):
        res = {r["id"]: r["count"] for r in exact_triangle_count(stream.edges).collect()}
        # one triangle (1,2,3)
        assert res[-1] == 1 and res[1] == 1 and res[2] == 1 and res[3] == 1
        assert 4 not in res

    def test_custom_summary(self, spark, stream):
        # degree histogram as a custom fold/combine
        def fold(s, row):
            s[row.src] = s.get(row.src, 0) + 1
            return s

        def combine(a, b):
            for k, v in b.items():
                a[k] = a.get(k, 0) + v
            return a

        res = summary_bulk_aggregation(
            stream.edges.select("src", "dst"), dict, fold, combine
        )
        assert collect_summaries(res)[0] == {1: 2, 2: 1, 3: 2}


class TestRunStreaming:
    def test_foreachbatch_incremental_merge(self, spark, tmp_path):
        from kafka_graphs_spark.streaming import run_streaming

        src_dir = str(tmp_path / "edges")
        ckpt = str(tmp_path / "ckpt")
        df = spark.createDataFrame(
            [(1, 2, "2026-01-01 00:00:05"), (2, 3, "2026-01-01 00:00:10"),
             (4, 5, "2026-01-01 00:00:15")],
            "src long, dst long, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.parquet(src_dir)

        stream = spark.readStream.schema(df.schema).parquet(src_dir)
        updates = []

        def fold(s, row):
            s.union(row.src, row.dst)
            return s

        q = run_streaming(
            stream.select("src", "dst", "event_time"),
            DisjointSet,
            fold,
            lambda a, b: a.merge(b),
            window_duration=None,
            on_update=lambda st: updates.append(st),
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)
        assert updates, "no micro-batch processed"
        comps = updates[-1][0].components()
        assert comps[1] == comps[2] == comps[3]
        assert comps[4] == comps[5] != comps[1]


class TestBuildNeighborhood:
    def test_undirected_adjacency_per_edge(self, stream):
        out = stream.build_neighborhood().collect()
        by_edge = {(r["src"], r["dst"]): sorted(r["neighborhood"]) for r in out}
        assert by_edge[(1, 2)] == [2, 3]
        assert by_edge[(3, 4)] == [1, 2, 4, 5]

    def test_directed(self, stream):
        out = stream.build_neighborhood(directed=True).collect()
        by_edge = {(r["src"], r["dst"]): sorted(r["neighborhood"]) for r in out}
        assert by_edge[(1, 2)] == [2, 3]
        assert by_edge[(3, 4)] == [4, 5]


# ---------------------------------------------------------------------------
# whole-stream frame tier (distributed, no driver state)
# ---------------------------------------------------------------------------

class TestFrameTier:
    def test_bipartiteness_frame_basic(self, spark):
        from kafka_graphs_spark.streaming import bipartiteness_frame

        tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
        assert bipartiteness_frame(tri).collect()[0]["success"] is False
        path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        assert bipartiteness_frame(path).collect()[0]["success"] is True

    def test_bipartiteness_frame_exact_above_2_53(self, spark):
        # ids past float53 precision: the doubled-id copy-back must use
        # exact integer division (ADVICE r03 — float div mis-mapped here)
        from kafka_graphs_spark.streaming import bipartiteness_frame

        b = (1 << 60) + 1
        odd = spark.createDataFrame(
            [(b, b + 1), (b + 1, b + 2), (b + 2, b)], "src long, dst long"
        )
        assert bipartiteness_frame(odd).collect()[0]["success"] is False
        even = spark.createDataFrame(
            [(b, b + 1), (b + 1, b + 2), (b + 2, b + 3), (b + 3, b)],
            "src long, dst long",
        )
        assert bipartiteness_frame(even).collect()[0]["success"] is True

    def test_bipartiteness_frame_domain_guard(self, spark):
        # |id| >= 2^62 would overflow the doubled encoding: assert, don't
        # silently mis-map
        from kafka_graphs_spark.streaming import bipartiteness_frame

        e = spark.createDataFrame([(1 << 62, 1)], "src long, dst long")
        with pytest.raises(Exception, match="2\\^62"):
            bipartiteness_frame(e).collect()

    def test_collect_summaries_size_guard(self, spark):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "src long, dst long"
        )
        res = connected_components(edges)
        with pytest.raises(RuntimeError, match="exceeds collect_summaries cap"):
            collect_summaries(res, max_bytes=10)
        # the default cap admits a window-bounded summary
        assert 0 in collect_summaries(res)

    def test_spanner_frame_guard(self, spark):
        from kafka_graphs_spark.streaming import spanner_frame

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(50)], "src long, dst long"
        )
        # forest: every edge kept
        assert spanner_frame(edges, k=2).count() == 50
        with pytest.raises(RuntimeError):
            spanner_frame(edges, k=2, max_summary_bytes=10)
        with pytest.raises(RuntimeError, match="use the windowed"):
            spanner_frame(edges, k=2, max_summary_edges=5)
