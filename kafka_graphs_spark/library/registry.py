"""Algorithm registry — name → (runner, initial vertex value, defaults).

Reference: io/kgraph/library/GraphAlgorithmType.java:33-116 — the enum of
REST-exposed algorithms (bfs, lcc, lp, mssp, pagerank, sssp, svdpp, wcc)
with per-algorithm serdes and initial-vertex-value mappers (bfs →
Long.MAX_VALUE, lp/wcc → id, sssp/pagerank → +∞, mssp → {}, lcc → 1.0).
Here the serde declarations become Spark schemas and the mappers become
Column expressions; each entry points at the DataFrame-native runner.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict

from pyspark.sql import functions as F

from kafka_graphs_spark.library.basic import (
    bipartite_projection,
    diameter_double_sweep,
    edge_count,
    reverse_edges,
    triangle_motif_census,
    vertex_count,
)
from kafka_graphs_spark.library.clustering_coefficient import local_clustering_coefficient
from kafka_graphs_spark.library.components import (
    connected_components,
    core_decomposition,
    k_core,
    label_propagation,
    k_truss,
)
from kafka_graphs_spark.library.pagerank import pagerank as _pagerank
from kafka_graphs_spark.library.paths import bfs, mssp, sssp
from kafka_graphs_spark.library.cf import als, sgd, svdpp
from kafka_graphs_spark.library.hits import eigenvector_centrality, hits, katz_centrality
from kafka_graphs_spark.library.hyperanf import hyperanf
from kafka_graphs_spark.library.basic import avg_neighbor_degree as _avg_nbr_deg
from kafka_graphs_spark.library.centrality import (
    betweenness_centrality,
    closeness_centrality,
    harmonic_centrality,
)
from kafka_graphs_spark.library.clustering import kmeans, semi_clustering
from kafka_graphs_spark.library.maxbmatching import max_b_matching
from kafka_graphs_spark.library.similarity import adamic_adar, jaccard
from kafka_graphs_spark.library.structure import (
    greedy_coloring,
    topological_levels,
    maximal_independent_set,
    minimum_spanning_forest,
    strongly_connected_components,
)
from kafka_graphs_spark.library.louvain import louvain
from kafka_graphs_spark.library.sybilrank import sybil_rank
from kafka_graphs_spark.library._loop import INF, MAX_LONG


@dataclass(frozen=True)
class AlgorithmSpec:
    name: str
    run: Callable                      # (graph, **params) -> DataFrame
    initial_vertex_value: Any          # Column expr fn of id (GraphAlgorithmType.java:95-116)
    vertex_value_type: str
    defaults: Dict[str, Any] = field(default_factory=dict)


ALGORITHMS: Dict[str, AlgorithmSpec] = {
    "bfs": AlgorithmSpec(
        "bfs", bfs, lambda id_col: F.lit(MAX_LONG), "long", {"src_vertex_id": 0}
    ),
    "sssp": AlgorithmSpec(
        "sssp", sssp, lambda id_col: F.lit(INF), "double", {"src_vertex_id": 0}
    ),
    "mssp": AlgorithmSpec(
        "mssp",
        mssp,
        lambda id_col: F.create_map().cast("map<bigint,double>"),
        "map<bigint,double>",
        {"landmark_vertex_ids": (0,)},
    ),
    "wcc": AlgorithmSpec(
        "wcc", connected_components, lambda id_col: id_col, "long", {}
    ),
    "lp": AlgorithmSpec(
        "lp", label_propagation, lambda id_col: id_col, "long", {"max_iterations": 10}
    ),
    "pagerank": AlgorithmSpec(
        "pagerank",
        _pagerank,
        lambda id_col: F.lit(0.0),
        "double",
        {"tolerance": 0.0001, "reset_probability": 0.15},
    ),
    "lcc": AlgorithmSpec(
        "lcc",
        local_clustering_coefficient,
        lambda id_col: F.lit(1.0),
        "double",
        {},
    ),
    "edge_count": AlgorithmSpec("edge_count", edge_count, lambda id_col: id_col, "long", {}),
    "vertex_count": AlgorithmSpec(
        "vertex_count", vertex_count, lambda id_col: id_col, "long", {}
    ),
    "reverse_edges": AlgorithmSpec(
        "reverse_edges", reverse_edges, lambda id_col: id_col, "long", {}
    ),
    "jaccard": AlgorithmSpec(
        "jaccard", jaccard, lambda id_col: id_col, "long", {"distance_conversion": False}
    ),
    "adamicadar": AlgorithmSpec(
        "adamicadar", adamic_adar, lambda id_col: F.lit(0.0), "double",
        {"distance_conversion": False},
    ),
    # svdpp completes the reference's REST enum (GraphAlgorithmType.java:33-93:
    # bfs, lcc, lp, mssp, pagerank, sssp, svdpp, wcc); the rest mirror the
    # non-REST ComputeFunctions in io/kgraph/library/.
    "svdpp": AlgorithmSpec(
        "svdpp", svdpp, lambda id_col: F.lit(0.0), "struct<b:double,p:array<double>>",
        {"dim": 10, "iterations": 10},
    ),
    "als": AlgorithmSpec(
        "als", als, lambda id_col: F.lit(0.0), "array<double>",
        {"dim": 50, "iterations": 10, "lambda_": 0.01},
    ),
    "sgd": AlgorithmSpec(
        "sgd", sgd, lambda id_col: F.lit(0.0), "array<double>",
        {"dim": 50, "iterations": 10, "lambda_": 0.01, "gamma": 0.005},
    ),
    "sybilrank": AlgorithmSpec(
        "sybilrank", sybil_rank, lambda id_col: F.lit(0.0), "double",
        {"iteration_multiplier": 1},
    ),
    "mbm": AlgorithmSpec(
        "mbm", max_b_matching, lambda id_col: F.lit(1), "int", {"max_iterations": 30}
    ),
    "kmeans": AlgorithmSpec(
        "kmeans", kmeans, lambda id_col: F.array(), "array<double>",
        {"k": 2, "max_iterations": 20, "epsilon": 0.001},
    ),
    "semiclustering": AlgorithmSpec(
        "semiclustering", semi_clustering, lambda id_col: F.array(F.array(id_col)),
        "array<array<bigint>>",
        {"iterations": 10, "max_clusters": 5, "cluster_capacity": 15, "score_factor": 0.5},
    ),
    # beyond-reference additions (no GraphAlgorithmType counterpart)
    "kcore": AlgorithmSpec(
        "kcore", k_core, lambda id_col: F.lit(0), "long", {"k": 2}
    ),
    "coreness": AlgorithmSpec(
        "coreness", core_decomposition, lambda id_col: F.lit(0), "long", {}
    ),
    "hits": AlgorithmSpec(
        "hits", hits, lambda id_col: F.lit(0), "long", {"iterations": 3}
    ),
    "ktruss": AlgorithmSpec(
        "ktruss", k_truss, lambda id_col: F.lit(0), "long", {"k": 3}
    ),
    "eigenvector": AlgorithmSpec(
        "eigenvector", eigenvector_centrality, lambda id_col: F.lit(0.0), "double",
        {"iterations": 4}
    ),
    "hyperanf": AlgorithmSpec(
        "hyperanf", hyperanf, lambda id_col: F.lit(0.0), "double",
        {"p": 6, "max_iterations": 16}
    ),
    "avg_neighbor_degree": AlgorithmSpec(
        "avg_neighbor_degree", _avg_nbr_deg, lambda id_col: F.lit(0.0), "double", {}
    ),
    "katz": AlgorithmSpec(
        "katz", katz_centrality, lambda id_col: F.lit(0.0), "double",
        {"alpha": 0.125, "iterations": 3}
    ),
    "closeness": AlgorithmSpec(
        "closeness", closeness_centrality, lambda id_col: F.lit(0.0), "double", {}
    ),
    "betweenness": AlgorithmSpec(
        "betweenness", betweenness_centrality, lambda id_col: F.lit(0.0), "double", {}
    ),
    "scc": AlgorithmSpec(
        "scc", strongly_connected_components, lambda id_col: id_col, "long", {}
    ),
    "msf": AlgorithmSpec(
        "msf", minimum_spanning_forest, lambda id_col: F.lit(0.0), "double", {}
    ),
    "mis": AlgorithmSpec(
        "mis", maximal_independent_set, lambda id_col: F.lit(0), "long", {"seed": 42}
    ),
    "coloring": AlgorithmSpec(
        "coloring", greedy_coloring, lambda id_col: F.lit(0), "int", {"seed": 42}
    ),
    "diameter": AlgorithmSpec(
        "diameter", diameter_double_sweep, lambda id_col: F.lit(0), "long", {}
    ),
    "motifs": AlgorithmSpec(
        "motifs", triangle_motif_census, lambda id_col: F.lit(0), "long", {}
    ),
    "bipartite_projection": AlgorithmSpec(
        "bipartite_projection", bipartite_projection, lambda id_col: F.lit(0),
        "long", {"onto": "src"},
    ),
    "topo_levels": AlgorithmSpec(
        "topo_levels", topological_levels, lambda id_col: F.lit(0), "long", {}
    ),
    "harmonic": AlgorithmSpec(
        "harmonic", harmonic_centrality, lambda id_col: F.lit(0.0), "double", {}
    ),
    "louvain": AlgorithmSpec(
        "louvain", louvain, lambda id_col: id_col, "long", {}
    ),
}


def get_algorithm(name: str) -> AlgorithmSpec:
    if name not in ALGORITHMS:
        raise KeyError(f"unknown algorithm {name!r}; available: {sorted(ALGORITHMS)}")
    return ALGORITHMS[name]
