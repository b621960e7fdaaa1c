"""Graph algorithm library — the reference's Pregel algorithms, DataFrame-native.

Reference: io/kgraph/library/ (17 ComputeFunctions) and the REST registry
io/kgraph/library/GraphAlgorithmType.java:33-116. Every algorithm here is
re-expressed as an iterative DataFrame recurrence (JVM-side expressions,
message combining as partial aggregation) rather than a per-vertex Java
compute function — same fixpoints, Spark-first physical execution. The
generic Python compute surface lives in kafka_graphs_spark.pregel for
user-defined algorithms.
"""

from kafka_graphs_spark.library.basic import (
    bipartite_projection,
    diameter_double_sweep,
    edge_count,
    graph_statistics,
    degree_histogram,
    transitivity,
    avg_neighbor_degree,
    ppmi,
    degree_assortativity,
    powerlaw_alpha,
    reciprocity,
    rich_club,
    triangle_motif_census,
    reverse_edges,
    vertex_count,
)
from kafka_graphs_spark.library.clustering_coefficient import (
    local_clustering_coefficient,
    local_clustering_coefficient_pregel,
)
from kafka_graphs_spark.library.components import (
    connected_components,
    core_decomposition,
    k_core,
    k_truss,
    conductance,
    label_propagation,
    modularity,
)
from kafka_graphs_spark.library.louvain import louvain
from kafka_graphs_spark.library.pagerank import pagerank, ppr_multi
from kafka_graphs_spark.library.paths import (
    bfs,
    mssp,
    node2vec_walks,
    random_walks,
    sssp,
    temporal_earliest_arrival,
    temporal_latest_departure,
)
from kafka_graphs_spark.library.registry import ALGORITHMS, get_algorithm
from kafka_graphs_spark.library.similarity import adamic_adar, jaccard
from kafka_graphs_spark.library.cf import als, als_ml, predict, sgd, svdpp, svdpp_predict
from kafka_graphs_spark.library.clustering import kmeans, kmeans_ml, semi_clustering
from kafka_graphs_spark.library.maxbmatching import max_b_matching
from kafka_graphs_spark.library.sybilrank import sybil_rank
from kafka_graphs_spark.library.hits import eigenvector_centrality, hits, katz_centrality
from kafka_graphs_spark.library.hyperanf import effective_diameter, hyperanf
from kafka_graphs_spark.library.centrality import (
    betweenness_centrality,
    closeness_centrality,
    harmonic_centrality,
)
from kafka_graphs_spark.library.structure import (
    greedy_coloring,
    maximal_independent_set,
    minimum_spanning_forest,
    strongly_connected_components,
    topological_levels,
)
from kafka_graphs_spark.library.motif import find as find_motifs

__all__ = [
    "find_motifs",
    "bfs",
    "sssp",
    "temporal_earliest_arrival",
    "temporal_latest_departure",
    "mssp",
    "random_walks",
    "node2vec_walks",
    "connected_components",
    "core_decomposition",
    "k_core",
    "k_truss",
    "louvain",
    "modularity",
    "conductance",
    "label_propagation",
    "pagerank",
    "ppr_multi",
    "local_clustering_coefficient",
    "local_clustering_coefficient_pregel",
    "edge_count",
    "graph_statistics",
    "rich_club",
    "bipartite_projection",
    "diameter_double_sweep",
    "ppmi",
    "triangle_motif_census",
    "degree_histogram",
    "transitivity",
    "avg_neighbor_degree",
    "degree_assortativity",
    "powerlaw_alpha",
    "reciprocity",
    "vertex_count",
    "reverse_edges",
    "jaccard",
    "adamic_adar",
    "sybil_rank",
    "eigenvector_centrality",
    "hyperanf",
    "effective_diameter",
    "hits",
    "katz_centrality",
    "closeness_centrality",
    "harmonic_centrality",
    "betweenness_centrality",
    "strongly_connected_components",
    "minimum_spanning_forest",
    "maximal_independent_set",
    "greedy_coloring",
    "topological_levels",
    "max_b_matching",
    "als",
    "sgd",
    "als_ml",
    "predict",
    "kmeans",
    "kmeans_ml",
    "semi_clustering",
    "svdpp",
    "svdpp_predict",
    "ALGORITHMS",
    "get_algorithm",
]
