"""Neighborhood similarity: Jaccard and Adamic-Adar, per connected pair.

Reference compute functions:
- io/kgraph/library/similarity/Jaccard.java:36-224 — superstep 0 each
  vertex broadcasts its out-neighbor list; superstep 1 each receiver v,
  for the message from u, sets edge value (v→u) = |common|/|union| of the
  two out-neighbor sets; optional ScaleToDistance: 1/sim − 1 (MAX if 0).
- io/kgraph/library/similarity/AdamicAdar.java:33-230 — superstep 0
  vertex value = log(1/outdeg); superstep 1 broadcast (value, friends);
  superstep 2 edge value (v→w) += Σ log(1/outdeg(u)) over every
  in-neighbor u of v that also lists w; optional ScaleToDistance: × −1.

Spark re-expression: the friends-list broadcast + per-vertex set
intersection becomes an edge-table self-join on the shared endpoint —
the shuffle carries vertex ids only, never materialized adjacency lists
(the reference ships whole neighbor lists as messages; at 100 TB those
lists are the skew bomb, the join form is partial-aggregated map-side).

Scale note: a vertex of degree d contributes d² join rows (its neighbor
pairs). For power-law graphs cap the blow-up upstream by filtering hub
vertices or salting; AQE skew-join splitting handles moderate skew.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph

_DOUBLE_MAX = sys.float_info.max  # reference ScaleToDistance uses Double.MAX_VALUE


def jaccard(graph: Graph, distance_conversion: bool = False) -> DataFrame:
    """Per-edge Jaccard similarity of out-neighbor sets → (src, dst, value).

    For each edge v→u whose reverse u→v also exists (always, in the
    undirected graphs the reference targets), value =
    |out(v) ∩ out(u)| / |out(v) ∪ out(u)|. Edges without a reverse keep
    their original value (the reference's setNewEdgeValue(src, ...) is a
    no-op when the edge is absent, Jaccard.java:159-161).
    """
    e = graph.edges.select("src", "dst").persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    # only reciprocal pairs are updated; message direction u→v, edge v→u
    pairs = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .join(e.select(F.col("dst").alias("v"), F.col("src").alias("u")), on=["v", "u"], how="left_semi")
    )

    # common(v,u) = |out(v) ∩ out(u)| via self-join on the shared target;
    # the semi-join BEFORE the aggregation keeps only connected pairs, so
    # co-neighbor pairs with no edge (the vast majority at scale) never
    # reach the shuffle.
    a = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    b = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    common = (
        a.join(b, on="w")
        .filter(F.col("v") != F.col("u"))
        .join(pairs, on=["v", "u"], how="left_semi")
        .groupBy("v", "u")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sim = (
        pairs.join(common, on=["v", "u"], how="left")
        .join(deg.withColumnRenamed("src", "v").withColumnRenamed("d", "dv"), on="v")
        .join(deg.withColumnRenamed("src", "u").withColumnRenamed("d", "du"), on="u")
        .select(
            F.col("v").alias("src"),
            F.col("u").alias("dst"),
            (
                F.coalesce(F.col("common"), F.lit(0)).cast("double")
                / (F.col("dv") + F.col("du") - F.coalesce(F.col("common"), F.lit(0)))
            ).alias("_sim"),
        )
    )
    out_cols = [c for c in graph.edges.columns if c not in ("src", "dst", "value")]
    result = (
        graph.edges.join(sim, on=["src", "dst"], how="left")
        .select(
            "src",
            "dst",
            F.coalesce(F.col("_sim"), F.col("value").cast("double")).alias("value"),
            *out_cols,
        )
    )
    if distance_conversion:
        # Jaccard.java:185-191 — (1/sim) − 1, Double.MAX_VALUE when sim == 0
        result = result.withColumn(
            "value",
            F.when(F.abs(F.col("value")) > 0, (F.lit(1.0) / F.col("value")) - 1.0)
            .otherwise(F.lit(_DOUBLE_MAX)),
        )
    out = result.localCheckpoint(eager=True)
    e.unpersist()
    return out


def adamic_adar(graph: Graph, distance_conversion: bool = False) -> DataFrame:
    """Per-edge Adamic-Adar score → (src, dst, value).

    value(v→w) = original(v→w) + Σ log(1/outdeg(u)) over every u with
    u→v ∈ E, w ∈ out(u), w ≠ v. (The reference ADDS onto the existing
    edge value, AdamicAdar.java:166-173; with all-zero initial edge
    values this is the textbook AA over common in/out-neighbors.)
    """
    e = graph.edges.select("src", "dst").persist()
    invlog = e.groupBy("src").agg(
        F.log(F.lit(1.0) / F.count(F.lit(1))).alias("ild")
    )  # log(1/outdeg); vertices with no out-edges send nothing anyway

    # u→v and u→w (v≠w) with an existing edge v→w ⇒ contribute ild(u)
    uv = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    uw = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    contrib = (
        uv.join(uw, on="u")
        .filter(F.col("v") != F.col("w"))
        .join(invlog.withColumnRenamed("src", "u"), on="u")
        .join(
            e.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            on=["v", "w"],
            how="left_semi",
        )
        .groupBy("v", "w")
        .agg(F.sum("ild").alias("aa"))
    )
    out_cols = [c for c in graph.edges.columns if c not in ("src", "dst", "value")]
    result = (
        graph.edges.join(
            contrib.select(F.col("v").alias("src"), F.col("w").alias("dst"), "aa"),
            on=["src", "dst"],
            how="left",
        )
        .select(
            "src",
            "dst",
            (F.col("value").cast("double") + F.coalesce(F.col("aa"), F.lit(0.0))).alias("value"),
            *out_cols,
        )
    )
    if distance_conversion:
        # AdamicAdar.java ScaleToDistance — multiply by −1
        result = result.withColumn("value", F.col("value") * F.lit(-1.0))
    out = result.localCheckpoint(eager=True)
    e.unpersist()
    return out
