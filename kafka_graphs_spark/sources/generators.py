"""Deterministic graph generators — distributed, no driver-side loops.

Reference: io/kgraph/utils/GraphGenerators.java:40-98. The reference builds
edge lists in a Java loop and produces them to Kafka; at 100 TB scale the
generator itself must be distributed, so every generator here is a
``spark.range`` pipeline (parallel, no collect).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def complete_graph(spark: SparkSession, n: int, num_partitions: int | None = None) -> Graph:
    """K_n: every ordered pair i != j, edge value 1L.

    Reference: GraphGenerators.completeGraph (GraphGenerators.java:40-53).
    Implemented as range × range cross join with the i != j filter — Spark
    parallelizes both sides; O(n²) edges are produced by executors.
    """
    r = spark.range(n, numPartitions=num_partitions) if num_partitions else spark.range(n)
    a = r.select(F.col("id").alias("src"))
    b = r.select(F.col("id").alias("dst"))
    edges = a.crossJoin(b).filter(F.col("src") != F.col("dst")).withColumn("value", F.lit(1).cast("long"))
    return Graph.from_edges(edges, F.lit(1).cast("long"))


def grid_graph(spark: SparkSession, rows: int, cols: int) -> Graph:
    """rows×cols grid; vertex id = row*cols + col; edges right and down, value 1L.

    Reference: GraphGenerators.gridGraph (GraphGenerators.java:55-87).
    """
    cells = spark.range(rows * cols).select(
        F.col("id"),
        (F.col("id") / cols).cast("long").alias("r"),
        (F.col("id") % cols).alias("c"),
    )
    right = cells.filter(F.col("c") < cols - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    down = cells.filter(F.col("r") < rows - 1).select(
        F.col("id").alias("src"), (F.col("id") + cols).alias("dst")
    )
    edges = right.unionByName(down).withColumn("value", F.lit(1).cast("long"))
    return Graph.from_edges(edges, F.lit(1).cast("long"))


def star_graph(spark: SparkSession, n: int) -> Graph:
    """Star: edges i → 0 for i in 1..n-1, value 1L.

    Reference: GraphGenerators.starGraph (GraphGenerators.java:89-98).
    NOTE the hub vertex 0 is the classic skew key at scale — algorithms over
    star-like graphs rely on partial aggregation (map-side combine) of
    messages, which every combiner-enabled Pregel algorithm here uses.
    """
    edges = (
        spark.range(1, n)
        .select(F.col("id").alias("src"), F.lit(0).cast("long").alias("dst"))
        .withColumn("value", F.lit(1).cast("long"))
    )
    return Graph.from_edges(edges, F.lit(1).cast("long"))


def random_graph(
    spark: SparkSession, n: int, p: float, seed: int = 42
) -> Graph:
    """Seeded Erdős–Rényi G(n, p): the directed edge (i, j), i ≠ j, exists
    iff the md5-derived uniform of ``"seed:i:j"`` falls below ``p``.

    Beyond-reference fourth generator: deterministic everywhere (same
    hash → same graph on any engine, partitioning, or cluster size — the
    same md5-fraction contract the samplers use) and fully distributed:
    the candidate pairs come from a range×range cross join that executors
    generate and immediately filter, so only ~p·n² edges materialize.
    Value 1L like the reference generators.
    """
    if not (0.0 <= p <= 1.0):
        raise ValueError("p must be in [0, 1]")
    r = spark.range(n)
    a = r.select(F.col("id").alias("src"))
    b = r.select(F.col("id").alias("dst"))
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("src"), F.col("dst"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    edges = (
        a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .filter(frac < F.lit(float(p)))
        .withColumn("value", F.lit(1).cast("long"))
    )
    return Graph.from_edges(edges, F.lit(1).cast("long"))
