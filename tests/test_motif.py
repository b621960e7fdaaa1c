"""Motif finding (library/motif.py) — grammar, join semantics, plan hygiene.

Semantics model: GraphFrames ``find()`` (see the module docstring). The
fixture graph is chosen so every interesting case is non-vacuous: a
transitive triangle, a self-loop, a diamond with one missing closing edge.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def motif_graph(spark):
    from kafka_graphs_spark import Graph

    # 1→2→3, 1→3 (transitive triangle), 3→4, 4→4 (self-loop)
    return Graph.from_collection(
        spark,
        [(i, i * 10) for i in range(1, 5)],
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 2), (4, 4, 9)],
    )


def _ids(rows, *names):
    return sorted(tuple(getattr(r, n).id for n in names) for r in rows)


class TestMotifFind:
    def test_single_edge_structs(self, motif_graph):
        rows = motif_graph.find("(a)-[e]->(b)").collect()
        assert len(rows) == 5
        r = {(x.a.id, x.b.id): x for x in rows}
        assert r[(1, 3)].e.value == 5
        assert r[(1, 3)].a.value == 10 and r[(1, 3)].b.value == 30
        # column order = first appearance in the pattern
        df = motif_graph.find("(a)-[e]->(b)")
        assert df.columns == ["a", "e", "b"]

    def test_two_hop_join(self, motif_graph):
        rows = motif_graph.find("(a)-[]->(b); (b)-[]->(c)").collect()
        assert _ids(rows, "a", "b", "c") == [
            (1, 2, 3),
            (1, 3, 4),
            (2, 3, 4),
            (3, 4, 4),
            (4, 4, 4),
        ]

    def test_transitive_triangle(self, motif_graph):
        rows = motif_graph.find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)").collect()
        # Pure join semantics: the self-loop participates (GraphFrames
        # parity — no distinctness; add id filters for isomorphism).
        assert _ids(rows, "a", "b", "c") == [(1, 2, 3), (3, 4, 4), (4, 4, 4)]

    def test_distinct_vertex_filter(self, motif_graph):
        df = motif_graph.find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)").filter(
            "a.id < b.id AND b.id < c.id"
        )
        assert _ids(df.collect(), "a", "b", "c") == [(1, 2, 3)]

    def test_negated_edge(self, motif_graph):
        rows = motif_graph.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)").collect()
        assert _ids(rows, "a", "b", "c") == [(1, 3, 4), (2, 3, 4)]

    def test_self_loop_pattern(self, motif_graph):
        rows = motif_graph.find("(a)-[]->(a)").collect()
        assert [r.a.id for r in rows] == [4]

    def test_edge_attribute_filter(self, motif_graph):
        df = motif_graph.find("(a)-[e]->(b)").filter(F.col("e.value") > 2)
        assert sorted((r.e.src, r.e.dst, r.e.value) for r in df.collect()) == [
            (1, 3, 5),
            (4, 4, 9),
        ]

    def test_anonymous_elements(self, motif_graph):
        assert motif_graph.find("()-[]->()").count() == 5
        # anonymous middle vertex still joins the two terms? No — anonymous
        # binds nothing, so the terms are disconnected: 5 * 5 matches.
        assert motif_graph.find("(a)-[]->(); ()-[]->(b)").count() == 25

    def test_disconnected_cross_product(self, motif_graph):
        assert motif_graph.find("(a)-[]->(b); (c)-[]->(d)").count() == 25

    def test_vertex_attributes_attached(self, motif_graph):
        row = (
            motif_graph.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
            .filter("a.id = 1")
            .collect()[0]
        )
        assert (row.a.value, row.b.value, row.c.value) == (10, 30, 40)

    @pytest.mark.parametrize(
        "bad",
        [
            "(a)-[e]->(b); (b)-[e]->(c)",  # duplicate edge name
            "(a)-[a]->(b)",  # edge name collides with vertex name
            "!(a)-[x]->(b)",  # negated edge must be anonymous
            "!(a)-[]->(b)",  # negated endpoints unbound
            "(a)->(b)",  # malformed
            "",  # empty
        ],
    )
    def test_rejects(self, motif_graph, bad):
        with pytest.raises(ValueError):
            motif_graph.find(bad)

    def test_plan_is_pure_joins(self, motif_graph):
        plan = motif_graph.find(
            "(a)-[e]->(b); (b)-[f]->(c); !(a)-[]->(c)"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # negation compiles to an anti-join, not a filter-over-collect
        assert "LeftAnti" in plan
