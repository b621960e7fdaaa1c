import os

import pytest
from pyspark.sql import SparkSession

# Executor python workers must import both the package and the test modules
# (pytest puts these on sys.path driver-side only; workers inherit env).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO, os.path.join(_REPO, "tests"), os.environ.get("PYTHONPATH", "")]
)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-graphs-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture
def long_long_graph(spark):
    """F1 fixture — the reference's canonical operator-test graph.

    Reference: kafka-graphs-core/src/test/java/io/kgraph/TestGraphUtils.java:28-64.
    """
    from kafka_graphs_spark import Graph

    vertices = [(i, i) for i in range(1, 6)]
    edges = [
        (1, 2, 12),
        (1, 3, 13),
        (2, 3, 23),
        (3, 4, 34),
        (3, 5, 35),
        (4, 5, 45),
        (5, 1, 51),
    ]
    return Graph.from_collection(spark, vertices, edges)


def rows_set(df):
    return {tuple(r) for r in df.collect()}
