"""Property-based tests (hypothesis) for the mergeable streaming summaries.

Pure-Python targets (no SparkSession): DisjointSet, Candidates,
AdjacencyListGraph — each checked against an independent brute-force
model on random edge lists, including the MERGE path (fold two halves,
merge partials) that the distributed two-level aggregation exercises.
"""

from collections import defaultdict, deque

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_graphs_spark.streaming.summaries import (
    AdjacencyListGraph,
    Candidates,
    DisjointSet,
)

edge = st.tuples(st.integers(0, 15), st.integers(0, 15))
edges_list = st.lists(edge, max_size=40)


def brute_components(pairs):
    adj = defaultdict(set)
    nodes = set()
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
        nodes.update((a, b))
    out = {}
    for start in nodes:
        if start in out:
            continue
        seen = {start}
        q = deque([start])
        while q:
            v = q.popleft()
            for n in adj[v]:
                if n not in seen:
                    seen.add(n)
                    q.append(n)
        label = min(seen)
        for v in seen:
            out[v] = label
    return out


def brute_bipartite(pairs):
    adj = defaultdict(set)
    nodes = set()
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
        nodes.update((a, b))
    color = {}
    for start in nodes:
        if start in color:
            continue
        color[start] = 0
        q = deque([start])
        while q:
            v = q.popleft()
            for n in adj[v]:
                if n not in color:
                    color[n] = color[v] ^ 1
                    q.append(n)
                elif color[n] == color[v]:
                    return False
    return True


class TestDisjointSetProperties:
    @given(edges_list)
    @settings(max_examples=200, deadline=None)
    def test_components_match_bfs(self, pairs):
        s = DisjointSet()
        for a, b in pairs:
            s.union(a, b)
        assert s.components() == brute_components(pairs)

    @given(edges_list, st.integers(0, 40))
    @settings(max_examples=200, deadline=None)
    def test_split_fold_then_merge(self, pairs, cut):
        cut = min(cut, len(pairs))
        left, right = DisjointSet(), DisjointSet()
        for a, b in pairs[:cut]:
            left.union(a, b)
        for a, b in pairs[cut:]:
            right.union(a, b)
        merged = left.merge(right) if len(right) < len(left) else right.merge(left)
        assert merged.components() == brute_components(pairs)


class TestCandidatesProperties:
    @given(edges_list)
    @settings(max_examples=200, deadline=None)
    def test_verdict_matches_bfs_coloring(self, pairs):
        # self-loops are odd cycles; the parity union-find agrees
        c = Candidates()
        ok = True
        for a, b in pairs:
            ok = c.add_edge(a, b)
        assert ok == c.success == brute_bipartite(pairs)

    @given(edges_list, st.integers(0, 40))
    @settings(max_examples=200, deadline=None)
    def test_split_fold_then_merge(self, pairs, cut):
        cut = min(cut, len(pairs))
        left, right = Candidates(), Candidates()
        for a, b in pairs[:cut]:
            left.add_edge(a, b)
        for a, b in pairs[cut:]:
            right.add_edge(a, b)
        assert left.merge(right).success == brute_bipartite(pairs)


class TestSpannerProperties:
    @given(edges_list, st.integers(1, 4))
    @settings(max_examples=150, deadline=None)
    def test_stretch_bound_for_every_observed_edge(self, pairs, k):
        g = AdjacencyListGraph(k)
        for a, b in pairs:
            if a != b:
                g.observe_edge(a, b)
        # spanner invariant: every observed edge's endpoints are within k
        # hops in the spanner (skipped edges were ≤ k at skip time and
        # edges are never removed)
        for a, b in pairs:
            if a != b:
                assert g.bounded_bfs_within(a, b), (a, b, k, g.adj)

    @given(edges_list, st.integers(1, 3), st.integers(0, 40))
    @settings(max_examples=150, deadline=None)
    def test_merge_preserves_stretch(self, pairs, k, cut):
        cut = min(cut, len(pairs))
        left, right = AdjacencyListGraph(k), AdjacencyListGraph(k)
        for a, b in pairs[:cut]:
            if a != b:
                left.observe_edge(a, b)
        for a, b in pairs[cut:]:
            if a != b:
                right.observe_edge(a, b)
        merged = left.merge(right)
        # replay-with-recheck merge preserves k-stretch for edges observed
        # at merge level, but an edge skipped INSIDE a partial relied on a
        # ≤ k path whose edges can themselves be replaced by the replay —
        # one merge level therefore guarantees stretch ≤ k² (hypothesis
        # found the witness: pairs=[(0,1),(1,2),(0,2),(0,3),(2,3)], k=2,
        # cut=1 → dist(2,3)=3 after merge)
        for a, b in pairs:
            if a != b:
                assert merged.bounded_bfs_within(a, b, bound=k * k)
