"""Structural decompositions: SCC, Boruvka MSF, Luby MIS, greedy coloring.

Cross-checked against tiny brute-force implementations (Tarjan, Kruskal)
written inline here — test utilities only, never imported by the engine.
"""

import random

import pytest
from pyspark.sql import functions as F

from kafka_graphs_spark import Graph
from kafka_graphs_spark.library import (
    greedy_coloring,
    maximal_independent_set,
    minimum_spanning_forest,
    strongly_connected_components,
)


def make_graph(spark, edges, edge_type="double"):
    e = spark.createDataFrame(edges, f"src long, dst long, value {edge_type}")
    return Graph.from_edges(e, F.col("id"))


# ---------------------------------------------------------------------------
# brute-force references (test-only)
# ---------------------------------------------------------------------------

def tarjan_scc(vertices, edges):
    """iterative Tarjan; returns {vertex: min id of its SCC}"""
    adj = {v: [] for v in vertices}
    for s, d in edges:
        adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]
    for root in vertices:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
    return comp


def kruskal_msf(vertices, wedges):
    """wedges: [(a, b, w)] undirected; returns set of (a, b, w) with a < b"""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted((w, min(a, b), max(a, b)) for a, b, w in wedges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


# ---------------------------------------------------------------------------
# SCC
# ---------------------------------------------------------------------------

class TestSCC:
    def test_two_cycles_with_bridge(self, spark):
        # cycle {1,2,3} → bridge → cycle {10,11}
        edges = [(1, 2, 0.0), (2, 3, 0.0), (3, 1, 0.0),
                 (3, 10, 0.0), (10, 11, 0.0), (11, 10, 0.0)]
        out = strongly_connected_components(make_graph(spark, edges))
        got = {r["id"]: r["value"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_dag_is_all_singletons(self, spark):
        edges = [(1, 2, 0.0), (1, 3, 0.0), (2, 4, 0.0), (3, 4, 0.0)]
        out = strongly_connected_components(make_graph(spark, edges))
        got = {r["id"]: r["value"] for r in out.collect()}
        assert got == {1: 1, 2: 2, 3: 3, 4: 4}

    def test_reverse_chain_peels(self, spark):
        # worst case for the peel: 5 singleton SCCs in a line 5→4→…→1
        edges = [(i + 1, i, 0.0) for i in range(1, 5)]
        out = strongly_connected_components(make_graph(spark, edges))
        got = {r["id"]: r["value"] for r in out.collect()}
        assert got == {i: i for i in range(1, 6)}

    def test_random_vs_tarjan(self, spark):
        rng = random.Random(7)
        n = 24
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
        edges = [(s, d) for s, d in edges if s != d]
        g = make_graph(spark, [(s, d, 0.0) for s, d in edges])
        vertices = sorted({v for e in edges for v in e})
        expect = tarjan_scc(vertices, edges)
        got = {r["id"]: r["value"] for r in
               strongly_connected_components(g).collect()}
        assert got == expect

    def test_empty_graph(self, spark):
        g = make_graph(spark, [(1, 2, 0.0)]).filter_on_edges(F.lit(False))
        g = Graph(g.vertices.limit(0), g.edges)
        assert strongly_connected_components(g).count() == 0


# ---------------------------------------------------------------------------
# Boruvka MSF
# ---------------------------------------------------------------------------

class TestMSF:
    def test_square_with_diagonal(self, spark):
        edges = [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 3.0), (4, 1, 4.0), (1, 3, 5.0)]
        out = minimum_spanning_forest(make_graph(spark, edges))
        got = {(r["src"], r["dst"], r["weight"]) for r in out.collect()}
        assert got == {(1, 2, 1.0), (2, 3, 2.0), (3, 4, 3.0)}

    def test_forest_two_components(self, spark):
        edges = [(1, 2, 1.0), (2, 3, 5.0), (1, 3, 2.0),
                 (10, 11, 1.0), (11, 12, 1.0)]
        out = minimum_spanning_forest(make_graph(spark, edges))
        got = {(r["src"], r["dst"], r["weight"]) for r in out.collect()}
        assert got == {(1, 2, 1.0), (1, 3, 2.0), (10, 11, 1.0), (11, 12, 1.0)}

    def test_random_vs_kruskal(self, spark):
        rng = random.Random(11)
        n = 30
        seen = set()
        wedges = []
        for _ in range(90):
            a, b = rng.randrange(n), rng.randrange(n)
            if a == b or (min(a, b), max(a, b)) in seen:
                continue
            seen.add((min(a, b), max(a, b)))
            wedges.append((a, b, float(rng.randrange(1, 10_000))))
        # dedupe colliding weights so the MSF is unique and edge-set
        # comparable (not just weight-comparable)
        seen_w = set()
        wedges = [e for e in wedges
                  if e[2] not in seen_w and not seen_w.add(e[2])]
        g = make_graph(spark, wedges)
        vertices = sorted({v for a, b, _ in wedges for v in (a, b)})
        expect = kruskal_msf(vertices, wedges)
        got = {(r["src"], r["dst"], r["weight"]) for r in
               minimum_spanning_forest(g).collect()}
        assert got == expect  # unique weights -> unique MSF, exact match

    def test_parallel_edges_collapse(self, spark):
        edges = [(1, 2, 5.0), (2, 1, 1.0), (2, 3, 2.0)]
        out = minimum_spanning_forest(make_graph(spark, edges))
        got = {(r["src"], r["dst"], r["weight"]) for r in out.collect()}
        assert got == {(1, 2, 1.0), (2, 3, 2.0)}


# ---------------------------------------------------------------------------
# Luby MIS
# ---------------------------------------------------------------------------

def check_mis(mis_ids, vertices, und_edges):
    mis = set(mis_ids)
    # independence
    for a, b in und_edges:
        assert not (a in mis and b in mis), f"edge ({a},{b}) inside MIS"
    # maximality
    adj = {v: set() for v in vertices}
    for a, b in und_edges:
        adj[a].add(b)
        adj[b].add(a)
    for v in vertices:
        if v not in mis:
            assert adj[v] & mis, f"vertex {v} not dominated"


class TestMIS:
    def test_triangle(self, spark):
        g = make_graph(spark, [(1, 2, 0.0), (2, 3, 0.0), (1, 3, 0.0)])
        out = sorted(r["id"] for r in maximal_independent_set(g).collect())
        assert len(out) == 1

    def test_isolated_vertices_included(self, spark):
        v = spark.createDataFrame([(1, 0), (2, 0), (9, 0)], "id long, value long")
        e = spark.createDataFrame([(1, 2, 0.0)], "src long, dst long, value double")
        out = {r["id"] for r in maximal_independent_set(Graph(v, e)).collect()}
        assert 9 in out and len(out & {1, 2}) == 1

    def test_random_invariants_and_determinism(self, spark):
        rng = random.Random(3)
        n = 50
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
        edges = [(a, b) for a, b in edges if a != b]
        g = make_graph(spark, [(a, b, 0.0) for a, b in edges])
        vertices = sorted({v for e in edges for v in e})
        got1 = sorted(r["id"] for r in maximal_independent_set(g).collect())
        got2 = sorted(r["id"] for r in maximal_independent_set(g).collect())
        assert got1 == got2  # deterministic hash priorities
        check_mis(got1, vertices, edges)


# ---------------------------------------------------------------------------
# greedy coloring
# ---------------------------------------------------------------------------

class TestColoring:
    def test_path_proper_within_degree_bound(self, spark):
        # MIS peeling on a path can legitimately need 3 colors (interior
        # vertices have degree 2); the guarantee is color(v) <= degree(v)
        g = make_graph(spark, [(i, i + 1, 0.0) for i in range(6)])
        out = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
        for i in range(6):
            assert out[i] != out[i + 1]
        assert out[0] <= 1 and out[6] <= 1  # endpoints: degree 1
        assert max(out.values()) <= 2

    def test_random_proper_and_degree_bound(self, spark):
        rng = random.Random(5)
        n = 40
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
        edges = [(a, b) for a, b in edges if a != b]
        g = make_graph(spark, [(a, b, 0.0) for a, b in edges])
        out = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
        deg = {}
        for a, b in {(min(a, b), max(a, b)) for a, b in edges}:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        for a, b in edges:
            assert out[a] != out[b], f"monochrome edge ({a},{b})"
        for v, c in out.items():
            assert c <= deg.get(v, 0), f"color({v})={c} > degree {deg.get(v, 0)}"


def test_registry_entries(spark):
    from kafka_graphs_spark.library import get_algorithm

    edges = [(1, 2, 1.0), (2, 1, 2.0), (2, 3, 3.0)]
    g = make_graph(spark, edges)
    scc = {r["id"]: r["value"] for r in get_algorithm("scc").run(g).collect()}
    assert scc == {1: 1, 2: 1, 3: 3}
    msf = {(r["src"], r["dst"]) for r in get_algorithm("msf").run(g).collect()}
    assert msf == {(1, 2), (2, 3)}
    mis = {r["id"] for r in get_algorithm("mis").run(g).collect()}
    assert mis in ({1, 3}, {2})
    col = {r["id"]: r["color"] for r in get_algorithm("coloring").run(g).collect()}
    assert col[1] != col[2] and col[2] != col[3]


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

class TestSessions:
    @pytest.fixture
    def events(self, spark):
        rows = [
            # user 1: two sessions split by a 45-min gap
            (0, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:10:00", 1, "b", 2.0),
            (2, "2024-01-01 00:55:00", 1, "c", 3.0),
            # user 2: one session, gap exactly 30 min (not a break: strict >)
            (3, "2024-01-01 01:00:00", 2, "a", 1.5),
            (4, "2024-01-01 01:30:00", 2, "b", 2.5),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double"
        )
        return df.withColumn("ts", F.to_timestamp("ts"))

    def test_sessionize(self, events):
        from kafka_graphs_spark.pipeline.sessions import sessionize

        out = {r["event_id"]: r["session"] for r in
               sessionize(events, gap_minutes=30).collect()}
        assert out == {0: 0, 1: 0, 2: 1, 3: 0, 4: 0}

    def test_session_stats(self, events):
        from kafka_graphs_spark.pipeline.sessions import session_stats

        out = {(r["user_id"], r["session"]): r for r in
               session_stats(events, gap_minutes=30).collect()}
        assert out[(1, 0)]["n_events"] == 2
        assert out[(1, 0)]["total_value"] == 3.0
        assert out[(1, 1)]["n_events"] == 1
        assert out[(2, 0)]["n_events"] == 2
        assert out[(2, 0)]["duration_us"] == 30 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# bipartite projection & double-sweep diameter
# ---------------------------------------------------------------------------

class TestBipartiteProjection:
    def test_shared_targets(self, spark):
        from kafka_graphs_spark.library import bipartite_projection

        # users 1,2 share items 10,11; users 2,3 share item 11
        edges = [(1, 10, 0.0), (1, 11, 0.0), (2, 10, 0.0), (2, 11, 0.0), (3, 11, 0.0)]
        g = make_graph(spark, edges)
        got = {(r["id_a"], r["id_b"]): r["weight"]
               for r in bipartite_projection(g, onto="src").collect()}
        assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}

    def test_hub_cap_drops_heavy_targets(self, spark):
        from kafka_graphs_spark.library import bipartite_projection

        edges = [(u, 99, 0.0) for u in range(1, 6)] + [(1, 10, 0.0), (2, 10, 0.0)]
        g = make_graph(spark, edges)
        got = {(r["id_a"], r["id_b"]): r["weight"]
               for r in bipartite_projection(g, onto="src", max_hub_degree=3).collect()}
        assert got == {(1, 2): 1}  # hub 99 (degree 5) dropped

    def test_onto_dst(self, spark):
        from kafka_graphs_spark.library import bipartite_projection

        edges = [(1, 10, 0.0), (1, 11, 0.0), (2, 10, 0.0)]
        g = make_graph(spark, edges)
        got = {(r["id_a"], r["id_b"]): r["weight"]
               for r in bipartite_projection(g, onto="dst").collect()}
        assert got == {(10, 11): 1}

    def test_param_guard(self, spark):
        from kafka_graphs_spark.library import bipartite_projection

        with pytest.raises(ValueError):
            bipartite_projection(make_graph(spark, [(1, 2, 0.0)]), onto="mid")


class TestDiameterDoubleSweep:
    def test_path_exact(self, spark):
        from kafka_graphs_spark.library import diameter_double_sweep
        from kafka_graphs_spark.sources import grid_graph

        row = diameter_double_sweep(grid_graph(spark, 1, 12)).collect()[0]
        assert (row["lower_bound"], row["start_id"], row["far_id"]) == (11, 11, 0)

    def test_star(self, spark):
        from kafka_graphs_spark.library import diameter_double_sweep
        from kafka_graphs_spark.sources import star_graph

        row = diameter_double_sweep(star_graph(spark, 50)).collect()[0]
        assert (row["lower_bound"], row["start_id"], row["far_id"]) == (2, 1, 2)

    def test_cycle(self, spark):
        from kafka_graphs_spark.library import diameter_double_sweep

        g = make_graph(spark, [(i, (i + 1) % 8, 0.0) for i in range(8)])
        row = diameter_double_sweep(g).collect()[0]
        assert row["lower_bound"] == 4  # C8 diameter exactly 4


class TestSCCPartitioning:
    def test_deep_dag_chain_resolves(self, spark):
        # 60-singleton chain: label-class partitioning must resolve this
        # in 2 outer rounds (the pre-partitioning peel needed 60)
        edges = [(i, i + 1, 0.0) for i in range(60)]
        out = strongly_connected_components(make_graph(spark, edges), max_iterations=30)
        got = {r["id"]: r["value"] for r in out.collect()}
        assert got == {i: i for i in range(61)}

    def test_chain_of_cycles(self, spark):
        # 6 triangles bridged in a chain — every condensation level a cycle
        edges = []
        for c in range(6):
            b = c * 3
            edges += [(b, b + 1, 0.0), (b + 1, b + 2, 0.0), (b + 2, b, 0.0)]
            if c:
                edges.append((b - 3, b, 0.0))
        out = strongly_connected_components(make_graph(spark, edges), max_iterations=30)
        got = {r["id"]: r["value"] for r in out.collect()}
        assert got == {i: (i // 3) * 3 for i in range(18)}


class TestPPMI:
    def test_hand_computed(self, spark):
        import math

        from kafka_graphs_spark.library import ppmi

        pairs = spark.createDataFrame(
            [(1, 2, 4), (1, 3, 1), (2, 3, 1)], "id_a long, id_b long, weight long"
        )
        got = {(r["id_a"], r["id_b"]): r["ppmi"] for r in ppmi(pairs).collect()}
        # T=6, m1=5, m2=5, m3=2
        assert got[(1, 2)] == pytest.approx(max(0.0, math.log(4 * 6 / 25)))
        assert got[(1, 3)] == pytest.approx(max(0.0, math.log(1 * 6 / 10)))
        assert got[(2, 3)] == pytest.approx(max(0.0, math.log(1 * 6 / 10)))

    def test_negative_pmi_clamped(self, spark):
        from kafka_graphs_spark.library import ppmi

        pairs = spark.createDataFrame(
            [(1, 2, 1), (1, 3, 100), (2, 4, 100)], "id_a long, id_b long, weight long"
        )
        got = {(r["id_a"], r["id_b"]): r["ppmi"] for r in ppmi(pairs).collect()}
        assert got[(1, 2)] == 0.0  # rare pair of two frequent items

    def test_empty(self, spark):
        from kafka_graphs_spark.library import ppmi

        pairs = spark.createDataFrame([], "id_a long, id_b long, weight long")
        assert ppmi(pairs).count() == 0


class TestTriangleMotifs:
    def test_all_classes(self, spark):
        from kafka_graphs_spark.library import triangle_motif_census

        edges = [
            # feed-forward 1,2,3: 1->2, 2->3, 1->3
            (1, 2, 0.0), (2, 3, 0.0), (1, 3, 0.0),
            # cycle 4,5,6: 4->5, 5->6, 6->4
            (4, 5, 0.0), (5, 6, 0.0), (6, 4, 0.0),
            # one reciprocated pair 7,8,9: 7<->8, 8->9, 7->9
            (7, 8, 0.0), (8, 7, 0.0), (8, 9, 0.0), (7, 9, 0.0),
            # fully reciprocated 10,11,12
            (10, 11, 0.0), (11, 10, 0.0), (11, 12, 0.0), (12, 11, 0.0),
            (10, 12, 0.0), (12, 10, 0.0),
        ]
        got = {r["motif"]: r["n"] for r in
               triangle_motif_census(make_graph(spark, edges)).collect()}
        assert got == {"030T": 1, "030C": 1, "120": 1, "300": 1}

    def test_reverse_cycle_and_210(self, spark):
        from kafka_graphs_spark.library import triangle_motif_census

        edges = [
            # reverse-orientation cycle: 3->2, 2->1, 1->3
            (3, 2, 0.0), (2, 1, 0.0), (1, 3, 0.0),
            # two reciprocated pairs 4,5,6: 4<->5, 5<->6, 4->6
            (4, 5, 0.0), (5, 4, 0.0), (5, 6, 0.0), (6, 5, 0.0), (4, 6, 0.0),
        ]
        got = {r["motif"]: r["n"] for r in
               triangle_motif_census(make_graph(spark, edges)).collect()}
        assert got == {"030C": 1, "210": 1}

    def test_no_triangles(self, spark):
        from kafka_graphs_spark.library import triangle_motif_census

        got = triangle_motif_census(make_graph(spark, [(1, 2, 0.0), (2, 3, 0.0)]))
        assert got.count() == 0


class TestTopologicalLevels:
    def test_grid_levels(self, spark):
        from kafka_graphs_spark.library import topological_levels
        from kafka_graphs_spark.sources import grid_graph

        # directed grid r x c: level(cell) = row + col
        out = topological_levels(grid_graph(spark, 4, 5))
        got = {r["id"]: r["level"] for r in out.collect()}
        assert got == {i: i // 5 + i % 5 for i in range(20)}

    def test_diamond(self, spark):
        from kafka_graphs_spark.library import topological_levels

        edges = [(1, 2, 0.0), (1, 3, 0.0), (2, 4, 0.0), (3, 4, 0.0), (2, 3, 0.0)]
        out = {r["id"]: r["level"] for r in
               topological_levels(make_graph(spark, edges)).collect()}
        assert out == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_cycle_raises(self, spark):
        from kafka_graphs_spark.library import topological_levels

        g = make_graph(spark, [(1, 2, 0.0), (2, 3, 0.0), (3, 1, 0.0)])
        with pytest.raises(ValueError, match="cycle"):
            topological_levels(g)


class TestHarmonicCentrality:
    def test_star_closed_form(self, spark):
        from kafka_graphs_spark.library import harmonic_centrality
        from kafka_graphs_spark.sources import star_graph

        got = {r["id"]: r["harmonic"] for r in
               harmonic_centrality(star_graph(spark, 50)).collect()}
        assert got[0] == 49.0
        for i in range(1, 50):
            assert got[i] == 25.0  # 1/1 + 48 * 1/2

    def test_path_values(self, spark):
        from kafka_graphs_spark.library import harmonic_centrality
        from kafka_graphs_spark.sources import grid_graph

        got = {r["id"]: r["harmonic"] for r in
               harmonic_centrality(grid_graph(spark, 1, 5)).collect()}
        for i in range(5):
            expect = sum(1.0 / abs(i - j) for j in range(5) if j != i)
            assert got[i] == pytest.approx(expect)

    def test_disconnected_robust(self, spark):
        from kafka_graphs_spark.library import harmonic_centrality

        # two components: no inf poisoning, isolated pair still scored
        g = make_graph(spark, [(1, 2, 1.0), (10, 11, 1.0)])
        got = {r["id"]: r["harmonic"] for r in harmonic_centrality(g).collect()}
        assert got == {1: 1.0, 2: 1.0, 10: 1.0, 11: 1.0}


# ---------------------------------------------------------------------------
# property tests (few examples — each runs a full Spark job)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
    unique=True,
)


class TestStructureProperties:
    @given(_edge_lists)
    @settings(max_examples=5, deadline=None)
    def test_scc_matches_tarjan(self, spark, edges):
        g = make_graph(spark, [(s, d, 0.0) for s, d in edges])
        vertices = sorted({v for e in edges for v in e})
        expect = tarjan_scc(vertices, list(edges))
        got = {r["id"]: r["value"] for r in
               strongly_connected_components(g).collect()}
        assert got == expect

    @given(_edge_lists, st.randoms(use_true_random=False))
    @settings(max_examples=5, deadline=None)
    def test_msf_matches_kruskal(self, spark, edges, rnd):
        # unique weights via a shuffled deterministic assignment
        ws = list(range(1, len(edges) + 1))
        rnd.shuffle(ws)
        wedges = []
        seen = set()
        for (a, b), w in zip(edges, ws):
            key = (min(a, b), max(a, b))
            if key in seen:
                continue
            seen.add(key)
            wedges.append((a, b, float(w)))
        g = make_graph(spark, wedges)
        vertices = sorted({v for a, b, _ in wedges for v in (a, b)})
        expect = kruskal_msf(vertices, wedges)
        got = {(r["src"], r["dst"], r["weight"]) for r in
               minimum_spanning_forest(g).collect()}
        assert got == expect


class TestDatasetCardExtras:
    def test_degree_histogram(self, spark):
        from kafka_graphs_spark.library import degree_histogram

        # 1 -> {2,3}, 2 -> {3}; vertex 3 has out-degree 0
        g = make_graph(spark, [(1, 2, 0.0), (1, 3, 0.0), (2, 3, 0.0)])
        got = {r["degree"]: r["n_vertices"] for r in
               degree_histogram(g, "out").collect()}
        assert got == {2: 1, 1: 1, 0: 1}
        got_in = {r["degree"]: r["n_vertices"] for r in
                  degree_histogram(g, "in").collect()}
        assert got_in == {0: 1, 1: 1, 2: 1}
        got_b = {r["degree"]: r["n_vertices"] for r in
                 degree_histogram(g, "both").collect()}
        assert got_b == {2: 3}
        with pytest.raises(ValueError):
            degree_histogram(g, "sideways")

    def test_reciprocity(self, spark):
        from kafka_graphs_spark.library import reciprocity

        # 1<->2 mutual, 1->3 one-way => 2 of 3 directed edges reciprocated
        g = make_graph(spark, [(1, 2, 0.0), (2, 1, 0.0), (1, 3, 0.0)])
        r = reciprocity(g).collect()[0]
        assert (r["n_directed"], r["n_reciprocated"]) == (3, 2)
        assert r["reciprocity"] == pytest.approx(2 / 3)
