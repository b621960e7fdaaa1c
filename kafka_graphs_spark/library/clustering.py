"""Clustering: k-means on vertex coordinate vectors, and semi-clustering.

Reference:
- io/kgraph/library/clustering/KMeansClustering.java:42-322 — leader
  picks k random initial centers (aggregator), each superstep assigns
  every point to its nearest center (aggregating per-center coordinate
  sums + counts), master recomputes centers, halts when every center
  moves less than ε=0.001 or at max iterations. Graph edges are UNUSED
  in the distance computation (the algorithm only rides the Pregel
  vertex loop).
- io/kgraph/library/clustering/SemiClustering.java:51-370 — each vertex
  keeps ≤ max_clusters overlapping semi-clusters scored
  (I − f_B·B) / (V(V−1)/2); per superstep it unions the cluster sets
  received from neighbors, extends non-full clusters with itself, and
  keeps the top-k by score.

Spark re-expression (k-means): centers are a small driver-side list
broadcast into a JVM-side argmin expression — assignment is whole-stage
codegen over ``aggregate(zip_with(...))``, the center update is one
partial-aggregated groupBy; no Python in the loop at all.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph


def _sq_dist(vec_col, center_lit):
    return F.aggregate(
        F.zip_with(vec_col, center_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    graph: Graph,
    k: int,
    max_iterations: int = 20,
    epsilon: float = 0.001,
    seed: int = 42,
    initial_centers: Optional[List[List[float]]] = None,
) -> DataFrame:
    """K-means over ``vertices(id, value array<double>)`` → (id, cluster int).

    Initial centers: k distinct vertices sampled deterministically by
    ``seed`` (the reference's leader does the same with the shared
    aggregator, KMeansClustering.java:175-210). Convergence: max center
    movement < ``epsilon`` (reference ε = 0.001) or ``max_iterations``.
    """
    from kafka_graphs_spark.library._loop import sized_cache

    pts, release_pts = sized_cache(
        graph.vertices.select("id", F.col("value").cast("array<double>").alias("vec"))
    )
    if initial_centers is not None:
        centers = [list(map(float, c)) for c in initial_centers]
    else:
        # deterministic sample of k distinct points (seeded driver choice —
        # the sampled ids are tiny; the POINTS never leave the cluster
        # except these k rows)
        ids = [r["id"] for r in pts.select("id").orderBy("id").limit(100 * k).collect()]
        chosen = random.Random(seed).sample(ids, min(k, len(ids)))
        centers = [
            list(map(float, r["vec"]))
            for r in pts.filter(F.col("id").isin(chosen)).collect()
        ]
    k = len(centers)

    for _ in range(max_iterations):
        # JVM-side nearest-center argmin: array of distances → min position
        dists = F.array(*[_sq_dist(F.col("vec"), F.array(*[F.lit(x) for x in c])) for c in centers])
        assigned = pts.select(
            "id", "vec", (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster")
        )
        stats = (
            assigned.select("cluster", F.posexplode("vec").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        new_centers = [list(c) for c in centers]
        sums: dict = {}
        for r in stats:
            sums.setdefault(r["cluster"], {})[r["dim"]] = (r["s"], r["c"])
        for ci, dims in sums.items():
            new_centers[ci] = [dims[d][0] / dims[d][1] for d in sorted(dims)]
        move = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(old, new)))
            for old, new in zip(centers, new_centers)
        )
        centers = new_centers
        if move < epsilon:
            break

    dists = F.array(*[_sq_dist(F.col("vec"), F.array(*[F.lit(x) for x in c])) for c in centers])
    out = pts.select(
        "id", (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster")
    ).localCheckpoint(eager=True)
    release_pts()
    return out


def kmeans_ml(graph: Graph, k: int, max_iterations: int = 20, seed: int = 42):
    """Cluster-scale fast path: pyspark.ml KMeans on the same points."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    pts = graph.vertices.select(
        "id", array_to_vector(F.col("value").cast("array<double>")).alias("features")
    )
    model = MLKMeans(k=k, maxIter=max_iterations, seed=seed).fit(pts)
    return model.transform(pts).select("id", F.col("prediction").alias("cluster"))


def semi_clustering(
    graph: Graph,
    iterations: int = 10,
    max_clusters: int = 5,
    cluster_capacity: int = 15,
    score_factor: float = 0.5,
) -> DataFrame:
    """Pregel-paper semi-clustering → (id, clusters array<array<id>>).

    Reference: SemiClustering.java:51-370. Per superstep each vertex
    unions the ≤max_clusters cluster sets of its neighbors, extends every
    non-full cluster that does not contain it with itself, scores
    ``(I − f_B·B) / (V·(V−1)/2)`` (I = weight inside, B = boundary
    weight), and keeps the top ``max_clusters`` by (score, members).

    Fully distributed re-expression (no driver-side adjacency — r01 ADVICE):
    candidate member-sets are sorted id arrays; the set algebra (union /
    extend / dedupe) is higher-order array functions, and the SCORER is
    relational — explode each distinct candidate cluster into its members,
    join the members' edges, and aggregate I (in-cluster weight, halved
    because the symmetric edge frame counts each unordered pair twice) and
    B (boundary weight) per cluster. Each superstep scores each distinct
    cluster exactly once, JVM-side end to end.
    """
    from pyspark.sql.window import Window

    from kafka_graphs_spark.library._loop import ChainLoop, message_loop, sized_cache

    und, release_und = sized_cache(
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
        .unionByName(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                F.col("value").cast("double").alias("w"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
    )

    # state: value = top-k clusters CONTAINING the vertex (SemiClustering.java
    # newVertexValue), outbox = top-k union set sent to neighbors
    state = (
        und.select(F.col("src").alias("id")).distinct()
        .select(
            "id", F.array(F.array("id")).alias("value"), F.array(F.array("id")).alias("outbox")
        )
    )
    loop = message_loop(und, bytes_per_row=512)
    try:
        out = _semi_clustering_loop(
            loop, state, und, iterations, max_clusters, cluster_capacity, score_factor
        )
    finally:
        loop.release()
        release_und()
    return out


def _semi_clustering_loop(
    loop, state, und, iterations, max_clusters, cluster_capacity, score_factor
):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    state, _ = loop.advance(state)

    for _ in range(iterations):
        msgs = (
            state.join(und, state["id"] == und["src"])
            .select(F.col("dst").alias("id"), "outbox")
        )
        gathered = msgs.groupBy("id").agg(
            F.array_distinct(F.flatten(F.collect_list("outbox"))).alias("cand")
        )

        # -- set algebra (SemiClustering.java:120-168): normalize received
        # clusters, extend non-full ones not containing self with self
        received = F.array_distinct(
            F.transform(F.col("cand"), lambda c: F.array_sort(F.array_distinct(c)))
        )
        extended = F.transform(
            F.filter(
                received,
                lambda c: (~F.array_contains(c, F.col("id")))
                & (F.size(c) < cluster_capacity),
            ),
            lambda c: F.array_sort(F.concat(c, F.array(F.col("id")))),
        )
        pairs = gathered.select(
            "id", F.explode(F.array_distinct(F.concat(received, extended))).alias("members")
        )

        # -- relational scorer: each distinct cluster scored once.
        # I counts every unordered in-cluster pair once (the symmetric frame
        # yields each twice ⇒ /2; a self-loop appears once ⇒ ×2 first);
        # B = member→outside weight (counted once per direction, as the
        # reference's per-member neighbor scan does).
        member_edges = (
            pairs.select("members").distinct()
            .select("members", F.explode("members").alias("m"))
            .join(und, F.col("m") == und["src"])
        )
        v_sz = F.size("members")
        scored = (
            member_edges.groupBy("members")
            .agg(
                (
                    F.sum(
                        F.when(
                            F.array_contains("members", F.col("dst")),
                            F.col("w")
                            * F.when(F.col("src") == F.col("dst"), 2.0).otherwise(1.0),
                        ).otherwise(0.0)
                    )
                    / 2.0
                ).alias("I"),
                F.sum(
                    F.when(
                        ~F.array_contains("members", F.col("dst")), F.col("w")
                    ).otherwise(0.0)
                ).alias("B"),
            )
            .select(
                "members",
                # singleton score = 0 (SemiClustering.java addVertex :292)
                F.when(v_sz <= 1, F.lit(0.0))
                .otherwise(
                    (F.col("I") - F.lit(score_factor) * F.col("B"))
                    / (v_sz.cast("double") * (v_sz - 1).cast("double") / 2.0)
                )
                .alias("score"),
            )
        )

        # -- top-k by (score desc, members asc) — the reference's TreeSet
        # comparator (SemiClustering.java:170-183). ONE window sort: the
        # rank within "clusters containing me" is a running conditional
        # count over the same ordering.
        ranked = (
            pairs.join(scored, on="members")
            .withColumn("_mine", F.array_contains("members", F.col("id")))
            .withColumn("_ns", -F.col("score"))
        )
        w_all = Window.partitionBy("id").orderBy(F.asc("_ns"), F.asc("members"))
        w_run = w_all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        topped = ranked.select(
            "id", "members", "_mine", "_ns",
            F.row_number().over(w_all).alias("_rn"),
            F.sum(F.when(F.col("_mine"), 1).otherwise(0)).over(w_run).alias("_rn_mine"),
        )
        sorted_slice = lambda flag: F.transform(  # noqa: E731
            F.sort_array(F.collect_list(F.when(flag, F.struct("_ns", "members")))),
            lambda x: x["members"],
        )
        new_state = topped.groupBy("id").agg(
            sorted_slice(F.col("_mine") & (F.col("_rn_mine") <= max_clusters)).alias("value"),
            sorted_slice(F.col("_rn") <= max_clusters).alias("outbox"),
        )
        state, _ = loop.advance(new_state)

    return state.select("id", F.col("value").alias("clusters")).localCheckpoint(
        eager=True
    )
