"""Bucketed graph storage (sources/bucketed.py) — roundtrip + shuffle elision.

The point of the feature is the PLAN: after load_bucketed, a
vertices⋈edges join on the bucket keys and a groupBy(src) aggregation
must run without an Exchange on the bucketed side(s).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def bucketed_graph(spark, tmp_path):
    from kafka_graphs_spark import Graph
    from kafka_graphs_spark.sources import drop_bucketed, load_bucketed, save_bucketed

    g = Graph.from_collection(
        spark,
        [(i, i * 10) for i in range(1, 9)],
        [(i, (i % 8) + 1, i) for i in range(1, 9)] + [(1, 5, 99), (2, 7, 98)],
    )
    save_bucketed(g, "tb", 4, path=str(tmp_path / "tb"))
    yield load_bucketed(spark, "tb"), g
    drop_bucketed(spark, "tb")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedStore:
    def test_roundtrip(self, bucketed_graph):
        loaded, orig = bucketed_graph
        assert sorted(map(tuple, loaded.vertices.collect())) == sorted(
            map(tuple, orig.vertices.collect())
        )
        assert sorted(map(tuple, loaded.edges.collect())) == sorted(
            map(tuple, orig.edges.collect())
        )

    def test_join_has_no_exchange(self, bucketed_graph, spark):
        loaded, _ = bucketed_graph
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = loaded.vertices.join(
                loaded.edges, loaded.vertices["id"] == loaded.edges["src"]
            )
            plan = _plan(j)
            assert "Exchange" not in plan, plan
            assert j.count() == 10
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_groupby_src_has_no_exchange(self, bucketed_graph):
        loaded, _ = bucketed_graph
        agg = loaded.edges.groupBy("src").agg(F.sum("value").alias("s"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == loaded.edges.select("src").distinct().count()

    def test_unbucketed_join_does_exchange(self, bucketed_graph, spark):
        # control: the same join over the raw (unbucketed) frames shuffles —
        # proves the elision above comes from the bucket spec, not the data size
        _, orig = bucketed_graph
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = orig.vertices.join(orig.edges, orig.vertices["id"] == orig.edges["src"])
            assert "Exchange" in _plan(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bad_name_rejected(self, bucketed_graph, spark):
        from kafka_graphs_spark.sources import save_bucketed

        loaded, _ = bucketed_graph
        with pytest.raises(ValueError):
            save_bucketed(loaded, "bad-name;drop", 4)
        with pytest.raises(ValueError):
            save_bucketed(loaded, "ok_name", 0)
