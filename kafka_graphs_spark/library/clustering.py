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
    pts = graph.vertices.select("id", F.col("value").cast("array<double>").alias("vec")).persist()
    n = pts.count()
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
    pts.unpersist()
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
    """Pregel-paper semi-clustering → (id, clusters array<struct>).

    Reference: SemiClustering.java:51-370. Per superstep each vertex
    unions the ≤max_clusters cluster sets of its neighbors, extends every
    non-full cluster that does not contain it with itself, scores
    ``(I − f_B·B) / (V·(V−1)/2)`` (I = weight inside, B = boundary
    weight), and keeps the top ``max_clusters`` by (score, members) —
    implemented as an Arrow-batched pandas pass per superstep over the
    collected neighborhood cluster sets.
    """
    import pandas as pd  # noqa: F401 — applyInPandas dependency

    und = (
        graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
        .unionByName(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                F.col("value").cast("double").alias("w"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    adj = und.groupBy(F.col("src").alias("id")).agg(
        F.map_from_entries(F.collect_list(F.struct("dst", "w"))).alias("nbrs")
    ).persist()
    adj.count()

    def score(members: tuple, nbrs_of: dict) -> float:
        ms = set(members)
        v = len(ms)
        if v <= 1:
            return 0.0  # singleton score (SemiClustering.java addVertex :292)
        inner = bound = 0.0
        seen = set()
        for m in ms:
            for t, w in nbrs_of.get(m, {}).items():
                if t in ms:
                    if (t, m) not in seen:
                        inner += w
                        seen.add((m, t))
                else:
                    bound += w
        return (inner - score_factor * bound) / (v * (v - 1) / 2.0)

    nbr_maps = {r["id"]: dict(r["nbrs"]) for r in adj.collect()}  # small per reference scale
    from kafka_graphs_spark.library._loop import LoopState

    # state: value = clusters CONTAINING the vertex (SemiClustering.java
    # newVertexValue), outbox = top-k union set sent to neighbors
    state = adj.select(
        "id", F.array(F.array("id")).alias("value"), F.array(F.array("id")).alias("outbox")
    )
    loop = LoopState()
    state = loop.checkpoint(state)

    def refine(batches):
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for vid, cand in zip(pdf["id"], pdf["cand"]):
                received = {tuple(sorted(set(c))) for c in cand}
                new_clusters = set()
                for c in received:
                    if vid not in c and len(c) < cluster_capacity:
                        new_clusters.add(tuple(sorted(set(c) | {vid})))
                unioned = received | new_clusters
                mine = {c for c in received if vid in c} | new_clusters
                key = lambda c: (-score(c, nbr_maps), c)  # noqa: E731
                value = [list(c) for c in sorted(mine, key=key)[:max_clusters]]
                outbox = [list(c) for c in sorted(unioned, key=key)[:max_clusters]]
                out_rows.append((int(vid), value, outbox))
            yield pd.DataFrame(out_rows, columns=["id", "value", "outbox"])

    for _ in range(iterations):
        msgs = (
            state.join(und, state["id"] == und["src"])
            .select(F.col("dst").alias("id"), "outbox")
        )
        gathered = msgs.groupBy("id").agg(
            F.flatten(F.collect_list("outbox")).alias("cand")
        )
        state = loop.checkpoint(
            gathered.mapInPandas(
                refine,
                schema="id long, value array<array<long>>, outbox array<array<long>>",
            )
        )

    out = state.select("id", F.col("value").alias("clusters")).localCheckpoint(eager=True)
    loop.release()
    und.unpersist()
    adj.unpersist()
    return out
