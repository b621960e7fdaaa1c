"""Mergeable single-pass graph summaries (pure Python, picklable).

Reference: io/kgraph/streaming/summaries/{DisjointSet,Candidates,
AdjacencyListGraph}.java — the only pure-unit-tested structures in the
reference (SURVEY.md §5). Each summary supports per-partition FOLD of
edges plus pairwise MERGE of partials, so a window's result is
fold-per-partition → tree-reduce — the SummaryBulkAggregation contract
(io/kgraph/streaming/SummaryAggregation.java:35-71).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, List, Optional, Set, Tuple


class DisjointSet:
    """Union-find with union-by-rank and path compression.

    Reference: io/kgraph/streaming/summaries/DisjointSet.java:58-158 —
    merge() unions every (element → parent) pair of the other set into a
    copy of self ("naive symmetric hash join").
    """

    def __init__(self, other: Optional["DisjointSet"] = None):
        self.parent: Dict = dict(other.parent) if other else {}
        self.rank: Dict = dict(other.rank) if other else {}

    def _make_set(self, e) -> None:
        self.parent[e] = e
        self.rank[e] = 0

    def find(self, e):
        if e not in self.parent:
            return None
        root = e
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[e] != root:  # path compression
            self.parent[e], e = root, self.parent[e]
        return root

    def union(self, e1, e2) -> None:
        if e1 not in self.parent:
            self._make_set(e1)
        if e2 not in self.parent:
            self._make_set(e2)
        r1, r2 = self.find(e1), self.find(e2)
        if r1 == r2:
            return
        if self.rank[r1] > self.rank[r2]:
            self.parent[r2] = r1
        elif self.rank[r1] < self.rank[r2]:
            self.parent[r1] = r2
        else:
            self.parent[r2] = r1
            self.rank[r1] += 1

    def merge(self, other: "DisjointSet") -> "DisjointSet":
        out = DisjointSet(self)
        for e, p in other.parent.items():
            out.union(e, p)
        return out

    def components(self) -> Dict:
        """element → component root (canonicalized to the min element)."""
        roots: Dict = {}
        for e in self.parent:
            r = self.find(e)
            roots.setdefault(r, []).append(e)
        out = {}
        for members in roots.values():
            label = min(members)
            for e in members:
                out[e] = label
        return out

    def __len__(self) -> int:
        return len(self.parent)


class Candidates:
    """Signed 2-coloring components for single-pass bipartiteness.

    Reference: io/kgraph/streaming/summaries/Candidates.java:80-201 —
    components hold {vertex: sign}; an edge that forces equal signs inside
    one component, or a component merge with a sign conflict, flips the
    summary to failure (graph not bipartite). Same semantics here via a
    parity union-find: parity[v] = color of v XOR color of parent(v); a
    conflict arises exactly when an odd cycle is observed — identical
    failure condition, O(α) per edge instead of the reference's
    O(component) scans.
    """

    def __init__(self, success: bool = True, other: Optional["Candidates"] = None):
        self.success = success
        self.parent: Dict[int, int] = dict(other.parent) if other else {}
        self.rank: Dict[int, int] = dict(other.rank) if other else {}
        self.parity: Dict[int, bool] = dict(other.parity) if other else {}

    @staticmethod
    def fail() -> "Candidates":
        return Candidates(success=False)

    def _find(self, v: int) -> Tuple[int, bool]:
        """(root, color of v relative to root), with path compression."""
        if v not in self.parent:
            self.parent[v] = v
            self.rank[v] = 0
            self.parity[v] = False
        path = []
        while self.parent[v] != v:
            path.append(v)
            v = self.parent[v]
        root = v
        p = False
        for w in reversed(path):
            p = p ^ self.parity[w]
            # compress: point w at root with its cumulative parity
            self.parity[w] = p
            self.parent[w] = root
        # recompute per-vertex parities relative to root for returned vertex
        return root, (self.parity[path[0]] if path else False)

    def _constrain(self, u: int, v: int, differ: bool) -> "Candidates":
        if not self.success:
            return Candidates.fail()
        out = Candidates(True, self)
        ru, pu = out._find(u)
        rv, pv = out._find(v)
        if ru == rv:
            if (pu ^ pv) != differ:
                return Candidates.fail()
            return out
        # union by rank; parity of the attached root chosen so the
        # constraint (color_u XOR color_v == differ) holds
        if out.rank[ru] < out.rank[rv]:
            ru, rv = rv, ru
            pu, pv = pv, pu
        out.parent[rv] = ru
        out.parity[rv] = pu ^ pv ^ differ
        if out.rank[ru] == out.rank[rv]:
            out.rank[ru] += 1
        return out

    def observe_edge(self, u: int, v: int) -> "Candidates":
        """Fold one (undirected) edge: endpoints must have DIFFERENT colors."""
        return self._constrain(u, v, True)

    def add_edge(self, u: int, v: int) -> bool:
        """In-place fold for the Spark partition loop (no per-edge copy).

        Returns the success flag after the edge (False once non-bipartite).
        """
        if not self.success:
            return False
        ru, pu = self._find(u)
        rv, pv = self._find(v)
        if ru == rv:
            if not (pu ^ pv):
                self.success = False
            return self.success
        if self.rank[ru] < self.rank[rv]:
            ru, rv = rv, ru
            pu, pv = pv, pu
        self.parent[rv] = ru
        self.parity[rv] = pu ^ pv ^ True
        if self.rank[ru] == self.rank[rv]:
            self.rank[ru] += 1
        return True

    def merge(self, other: "Candidates") -> "Candidates":
        """Failure propagates; otherwise replay the other summary's
        constraints (Candidates.java merge re-checks every sign)."""
        if not self.success or not other.success:
            return Candidates.fail()
        out = self
        o = Candidates(True, other)  # working copy for _find mutation
        for v in list(o.parent):
            r, p = o._find(v)
            if r == v:
                continue
            out = out._constrain(v, r, p)
            if not out.success:
                return Candidates.fail()
        return out

    def components(self) -> Dict[int, int]:
        out = {}
        roots: Dict[int, List[int]] = {}
        for v in self.parent:
            r, _ = self._find(v)
            roots.setdefault(r, []).append(v)
        for members in roots.values():
            label = min(members)
            for v in members:
                out[v] = label
        return out


class AdjacencyListGraph:
    """Adjacency-set graph with k-bounded BFS, for k-spanner maintenance.

    Reference: io/kgraph/streaming/summaries/AdjacencyListGraph.java —
    fold adds edge (u,v) only if the current u→v distance exceeds k
    (boundedBFS :91-126); merge replays the other graph's edges (:128-140).
    """

    def __init__(self, k: int, other: Optional["AdjacencyListGraph"] = None):
        self.k = k
        self.adj: Dict[int, Set[int]] = (
            {v: set(ns) for v, ns in other.adj.items()} if other else {}
        )

    def bounded_bfs_within(self, src: int, dst: int, bound: Optional[int] = None) -> bool:
        """True iff dist(src,dst) <= bound (default k) in the current spanner.

        ``bound`` matters for merged summaries: replay-with-recheck merge
        (AdjacencyListGraph.java:128-140) preserves stretch ≤ k for edges
        the merged spanner itself observed, but an edge SKIPPED inside a
        partial relied on a ≤ k path whose edges may themselves be
        replaced during replay — so one merge level guarantees only k².
        """
        bound = self.k if bound is None else bound
        if src not in self.adj or dst not in self.adj:
            return False
        seen = {src}
        frontier = deque([(src, 0)])
        while frontier:
            v, d = frontier.popleft()
            if v == dst:
                return True
            if d == bound:
                continue
            for n in self.adj.get(v, ()):
                if n not in seen:
                    seen.add(n)
                    frontier.append((n, d + 1))
        return False

    def observe_edge(self, u: int, v: int) -> None:
        if not self.bounded_bfs_within(u, v):
            self.adj.setdefault(u, set()).add(v)
            self.adj.setdefault(v, set()).add(u)

    def merge(self, other: "AdjacencyListGraph") -> "AdjacencyListGraph":
        out = AdjacencyListGraph(self.k, self)
        for u, ns in other.adj.items():
            for v in ns:
                if u < v:
                    out.observe_edge(u, v)
        return out

    def edges(self) -> List[Tuple[int, int]]:
        return sorted({(min(u, v), max(u, v)) for u, ns in self.adj.items() for v in ns})
