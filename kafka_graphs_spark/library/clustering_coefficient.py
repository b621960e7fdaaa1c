"""Local clustering coefficient.

Reference: io/kgraph/library/LocalClusteringCoefficient.java:34-135 — a
4-superstep message protocol:
  0: send own id to out-neighbors;
  1: N(v) = out-targets ∪ (in-sources ≠ v); value = |N(v)|; send the
     neighbor list to every neighbor (only if |N(v)| ≥ 2);
  2: each neighbor u replies with |out(u) ∩ N(v)|;
  3: lcc = Σmatches / (d·(d−1)), 0 when d < 2.

Batch-native equivalence (SURVEY.md §2.8 "triangle counting via edge-edge
join is far more idiomatic"): matches(v) counts directed edges (u→w) with
u,w ∈ N(v). That is a 3-way equi-join — neighborhood ⋈ edges ⋈
neighborhood — entirely JVM-side, partial-aggregated, no N(v) broadcast
(the reference ships whole adjacency lists as messages; at 100 TB the
join formulation shuffles ids only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """Returns (id, value double) — the reference's exact LCC definition."""
    e = graph.edges.select("src", "dst")

    # N(v): out-targets unconditionally, in-sources except self
    # (LocalClusteringCoefficient.java neighbors():69-83)
    nbrs = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .unionByName(
            e.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("v"), F.col("src").alias("u")
            )
        )
        .distinct()
        .persist()
    )

    deg = nbrs.groupBy("v").agg(F.count(F.lit(1)).alias("d"))

    # matches(v) = |{(u,w) ∈ N(v)×N(v) : u→w ∈ E}|
    # (inquiry/reply supersteps 1-2 collapse into one 3-way join)
    vu = nbrs.select(F.col("v"), F.col("u"))
    vw = nbrs.select(F.col("v").alias("v2"), F.col("u").alias("w"))
    matches = (
        vu.join(e, vu["u"] == e["src"])
        .join(vw, (F.col("dst") == F.col("w")) & (F.col("v") == F.col("v2")), "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("matches"))
    )

    result = (
        graph.vertices.select("id")
        .join(deg.withColumnRenamed("v", "id"), on="id", how="left")
        .join(matches.withColumnRenamed("v", "id"), on="id", how="left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 2,
                F.coalesce(F.col("matches"), F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )
    out = result.localCheckpoint(eager=True)
    nbrs.unpersist()
    return out
